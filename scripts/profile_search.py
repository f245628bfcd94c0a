"""Stage-by-stage breakdown of the exact top-k search on the real chip.

Times each component of the dense two-stage kernel separately so we know
where the batch latency actually goes before redesigning anything:

  matmul        - XLA bf16 matmul -> f32 sims write (HBM-bound reference)
  matmul_nosims - matmul + row-max fused, no [T, R] HBM write (upper bound)
  pallas        - fused matmul_blockmax kernel (sims + blockmax outputs)
  topk_blocks   - lax.top_k over the [T, NB] block-max + sort
  gather        - candidate block gather (take_along_axis) + id expansion
  merge         - final [Q, k] top_k merge
  engine        - the shipping SearchEngine program end to end

Timing discipline (CLAUDE.md): the relay adds ~26 ms per synchronous
dispatch and block_until_ready does not reliably synchronize, so every
measurement pipelines `iters` dispatches and then forces a 1-element
readback of the last output.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.bench.suite import SUITES, synthetic_device_store
from better_search_rag_rust_tpu.config import SearchConfig
from better_search_rag_rust_tpu.ops.engine import SearchEngine
from better_search_rag_rust_tpu.ops.topk_pallas import default_interpret, matmul_blockmax
from better_search_rag_rust_tpu.parallel.mesh import create_mesh


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def timeit(label: str, fn, *args, iters: int = 6) -> float:
    out = fn(*args)
    _force(out)  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:>28s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="search_1m")
    ap.add_argument("--q-tile", type=int, default=512)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    suite = SUITES[args.suite]
    mesh = create_mesh()
    print(f"devices={jax.devices()} suite={args.suite}", flush=True)

    t0 = time.perf_counter()
    store = synthetic_device_store(
        mesh, suite.rows, suite.dim, suite.store_dtype, suite.chunk_rows
    )
    print(f"store built in {time.perf_counter() - t0:.1f}s "
          f"shape={store.data.shape} dtype={store.data.dtype}", flush=True)

    T = args.q_tile
    k = suite.top_k
    block = 128
    data = store.data  # [R, D] padded
    R, D = data.shape
    NB = R // block
    kb = min(k, NB)

    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (T, D), dtype=jnp.float32)
    q = (q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(data.dtype)
    q = jax.device_put(q)
    _force(q)

    it = args.iters

    # --- raw matmul: bf16 x bf16 -> f32 sims in HBM --------------------------
    @jax.jit
    def mm(qq, dd):
        return jnp.dot(qq, dd.T, preferred_element_type=jnp.float32)

    timeit("xla matmul (sims write)", mm, q, data, iters=it)

    # --- matmul with the sims write fused away (bandwidth upper bound) ------
    @jax.jit
    def mm_nosims(qq, dd):
        s = jnp.dot(qq, dd.T, preferred_element_type=jnp.float32)
        return jnp.max(s.reshape(T, NB, block), axis=(0, 2))

    timeit("xla matmul+max (no sims)", mm_nosims, q, data, iters=it)

    # --- pallas fused kernel -------------------------------------------------
    @jax.jit
    def pk(qq, dd):
        return matmul_blockmax(qq, dd, jnp.int32(store.num_rows),
                               interpret=default_interpret())

    timeit("pallas matmul_blockmax", pk, q, data, iters=it)

    # --- block selection over [T, NB] ---------------------------------------
    sims, bm_t = pk(q, data)
    bm = bm_t.T
    _force(bm)

    @jax.jit
    def sel(b):
        _, ids = jax.lax.top_k(b, kb)
        return jnp.sort(ids, axis=1)

    timeit("top_k blocks [T,NB]", sel, bm, iters=it)

    block_ids = sel(bm)
    _force(block_ids)

    # --- candidate gather ----------------------------------------------------
    @jax.jit
    def gather(s, bids):
        s3 = s.reshape(T, NB, block)
        cand = jnp.take_along_axis(s3, bids[:, :, None], axis=1)
        cand_ids = (bids[:, :, None] * block
                    + jnp.arange(block, dtype=jnp.int32)[None, None, :])
        return cand.reshape(T, kb * block), cand_ids.reshape(T, kb * block)

    timeit("candidate gather", gather, sims, block_ids, iters=it)

    cand_vals, cand_ids = gather(sims, block_ids)
    _force(cand_vals)

    # --- gather via one-hot matmul (MXU instead of gather) -------------------
    @jax.jit
    def gather_onehot(s, bids):
        s3 = s.reshape(T, NB, block)
        onehot = jax.nn.one_hot(bids, NB, dtype=s.dtype)  # [T, kb, NB]
        cand = jnp.einsum("tkb,tbw->tkw", onehot, s3,
                          preferred_element_type=jnp.float32)
        return cand.reshape(T, kb * block)

    timeit("gather via one-hot mm", gather_onehot, sims, block_ids, iters=it)

    # --- final top-k over candidates -----------------------------------------
    @jax.jit
    def final(cv, ci):
        tv, pos = jax.lax.top_k(cv, k)
        return tv, jnp.take_along_axis(ci, pos, axis=1)

    timeit("final top_k [T,kb*128]", final, cand_vals, cand_ids, iters=it)

    del sims, cand_vals, cand_ids

    # --- shipping engine, a few q_tile variants ------------------------------
    for qt in (256, 512, 1024):
        if qt > suite.queries:
            continue
        cfg = SearchConfig(top_k=k, chunk_rows=suite.chunk_rows,
                           store_dtype=suite.store_dtype)
        eng = SearchEngine(store, cfg)
        eng._plan = lambda q_, k_, _qt=qt: (min(q_, _qt), 10**9)  # type: ignore
        fn = eng._get_fn(suite.queries, k)
        qb = jax.random.normal(jax.random.PRNGKey(2),
                               (suite.queries, D), dtype=jnp.float32)
        qb = jax.device_put(qb)
        dt = timeit(f"engine q_tile={qt}", fn, data, qb, iters=it)
        print(f"    -> {suite.queries / dt:,.0f} q/s", flush=True)


if __name__ == "__main__":
    main()
