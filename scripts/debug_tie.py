"""Reproduce + diagnose the engine-vs-oracle near-tie mismatch on chip.

All kernels agreed with each other but differed from oracle_topk at two
adjacent ranks on random_20k_768 bf16 — suspicion: the oracle's separately
jitted normalize+cast rounds a query element differently from the engine
program's fused normalize+cast, giving sims that differ by 1 ulp.

Sweeps many random queries against the engine and reports any mismatch
with the raw scores of the involved rows from both paths.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.config import SearchConfig
from better_search_rag_rust_tpu.ops import SearchEngine
from better_search_rag_rust_tpu.ops.distance import normalize_rows
from better_search_rag_rust_tpu.parallel.mesh import create_mesh
from better_search_rag_rust_tpu.store import DeviceStore


def main():
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((20000, 768)).astype(np.float32)
    mesh = create_mesh()
    store = DeviceStore.from_host(mat, mesh, dtype="bfloat16")
    eng = SearchEngine(store, SearchConfig(kernel="pallas",
                                           sims_buffer_bytes=0))

    qrng = np.random.default_rng(12345)
    found = 0
    for trial in range(40):
        qi = qrng.integers(0, mat.shape[0], 8)
        queries = mat[qi]
        ids, dists = eng.search(queries, k=100)
        o_ids, o_dists = eng.oracle_topk(queries, k=100)
        if np.array_equal(ids, o_ids):
            continue
        found += 1
        bad = np.argwhere(ids != o_ids)
        print(f"trial {trial}: {len(bad)} diffs at {bad[:6].tolist()}",
              flush=True)
        qrow, pos = bad[0]
        rows = sorted({int(ids[qrow, pos]), int(o_ids[qrow, pos]),
                       int(ids[qrow, pos - 1]) if pos else -1} - {-1})
        print("  engine ids/dists around:",
              ids[qrow, max(0, pos - 2):pos + 3].tolist(),
              dists[qrow, max(0, pos - 2):pos + 3].tolist(), flush=True)
        print("  oracle ids/dists around:",
              o_ids[qrow, max(0, pos - 2):pos + 3].tolist(),
              o_dists[qrow, max(0, pos - 2):pos + 3].tolist(), flush=True)

        # raw sims of the involved rows, three ways
        q = queries[qrow:qrow + 1]
        dev = jax.devices()[0]

        @jax.jit
        def sims_oracle_style(data, qq):
            qc = normalize_rows(qq).astype(data.dtype)
            return jnp.dot(qc, data.T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        s_o = np.asarray(sims_oracle_style(
            jax.device_put(np.asarray(jax.device_get(store.data)), dev),
            jax.device_put(
                np.pad(q, ((0, 0), (0, store.data.shape[1] - q.shape[1]))),
                dev)))[0]

        # engine-style: normalize on host f32, cast separately
        qn_host = q / np.linalg.norm(q, axis=1, keepdims=True)
        qb_host = jnp.asarray(qn_host).astype(jnp.bfloat16)

        @jax.jit
        def sims_cast_only(data, qb):
            return jnp.dot(qb, data.T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        s_c = np.asarray(sims_cast_only(
            jax.device_put(np.asarray(jax.device_get(store.data)), dev),
            jnp.pad(qb_host,
                    ((0, 0), (0, store.data.shape[1] - q.shape[1])))))[0]

        for r in rows:
            print(f"  row {r}: oracle-style sim {s_o[r]!r} "
                  f"host-norm sim {s_c[r]!r}", flush=True)
        # compare the two normalized-query bf16 vectors elementwise
        qc_dev = np.asarray(jax.jit(
            lambda qq: normalize_rows(qq).astype(jnp.bfloat16))(
                jnp.asarray(q)))
        diff = np.argwhere(
            qc_dev[0].astype(np.float32) != np.asarray(qb_host)[0].astype(
                np.float32))
        print(f"  normalized-query bf16 mismatch dims: {diff[:10].ravel().tolist()}"
              f" ({len(diff)} total)", flush=True)
        if found >= 3:
            break
    print(f"done, {found} mismatching trials", flush=True)


if __name__ == "__main__":
    main()
