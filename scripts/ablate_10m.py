"""Ablate the 10M pipeline: raw streaming vs +select vs +gather vs full."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.bench.suite import SUITES, synthetic_device_store
from better_search_rag_rust_tpu.ops.topk import PAD_SIM, _select_blocks, merge_topk
from better_search_rag_rust_tpu.ops.topk_pallas import matmul_blockmax
from better_search_rag_rust_tpu.parallel.mesh import create_mesh


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def timeit(label, fn, *args, iters=4):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:>44s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    suite = SUITES["search_10m_mat256"]
    mesh = create_mesh()
    store = synthetic_device_store(
        mesh, suite.rows, suite.dim, suite.store_dtype, suite.chunk_rows
    )
    data = store.data
    R, D = data.shape
    k, T = 100, 256
    MACRO = 3342336
    n_full = R // MACRO
    print(f"R={R} chunks={n_full} macro={MACRO}", flush=True)

    q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=data.dtype)
    _force(q)

    def chunks(dd):
        for c in range(n_full):
            yield c * MACRO, dd[c * MACRO:(c + 1) * MACRO]

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run(qq, dd, mode="full"):
        vals = jnp.full((T, k), PAD_SIM, jnp.float32)
        ids = jnp.full((T, k), jnp.iinfo(jnp.int32).max, jnp.int32)
        acc = jnp.zeros((T,), jnp.float32)
        for off, chunk in chunks(dd):
            sims, bm_t = matmul_blockmax(qq, chunk, jnp.int32(MACRO))
            bm = bm_t.T
            nb = bm.shape[1]
            if mode == "stream":  # matmul+bm only
                acc = acc + jnp.max(bm, axis=1) + sims[:, 0]
                continue
            bids = _select_blocks(bm, k)
            if mode == "select":
                acc = acc + jnp.sum(bids, axis=1).astype(jnp.float32)
                continue
            bids = jnp.sort(bids, axis=1)
            s3 = sims.reshape(T, nb, 128)
            cand = jnp.take_along_axis(s3, bids[:, :, None], axis=1)
            cand = cand.reshape(T, k * 128)
            if mode == "gather":
                acc = acc + jnp.sum(cand[:, ::256], axis=1)
                continue
            cid = (off + bids[:, :, None] * 128
                   + jnp.arange(128, dtype=jnp.int32)[None, None, :]).reshape(T, -1)
            tv, tp = jax.lax.top_k(cand, k)
            ti = jnp.take_along_axis(cid, tp, axis=1)
            vals, ids = merge_topk(vals, ids, tv, ti, k)
        if mode == "full":
            return vals, ids
        return acc

    for mode in ("stream", "select", "gather", "full"):
        timeit(f"mode={mode} ({n_full} chunks, T={T})", run, q, data, mode)


if __name__ == "__main__":
    main()
