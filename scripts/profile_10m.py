"""Stage breakdown for the 10M x 256 (Matryoshka) search config."""

from __future__ import annotations

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
    print(f"{label:>40s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    suite = SUITES["search_10m_mat256"]
    mesh = create_mesh()
    store = synthetic_device_store(
        mesh, suite.rows, suite.dim, suite.store_dtype, suite.chunk_rows
    )
    print(f"store {store.data.shape} {store.data.dtype}", flush=True)
    data = store.data
    R, D = data.shape
    k = 100

    eng = SearchEngine(store, SearchConfig(top_k=k))
    T, macro = eng._plan(1024, k)
    print(f"plan: q_tile={T} macro={macro} budget={eng._sims_budget()>>30}GB",
          flush=True)

    q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=data.dtype)
    _force(q)

    # half a macro chunk through the pallas kernel (profiling
    # pipelines iterations, so full-macro sims buffers would OOM)
    chunk = macro // 2 - (macro // 2) % 1024
    part = data[:chunk]

    @jax.jit
    def pk(qq, dd):
        return matmul_blockmax(qq, dd, jnp.int32(chunk))

    timeit(f"pallas mm+bm [T={T} x {chunk}]", pk, q, part, iters=2)

    @jax.jit
    def mm_only(qq, dd):
        return jnp.dot(qq, dd.T, preferred_element_type=jnp.float32)

    timeit("xla matmul only", mm_only, q, part, iters=2)

    sims, bm_t = pk(q, part)
    bm = bm_t.T
    NB = bm.shape[1]
    _force(bm)
    print(f"NB per chunk = {NB}", flush=True)

    @jax.jit
    def sel_approx(b):
        av, ap = jax.lax.approx_max_k(b, 128, recall_target=1.0)
        neg, ids = jax.lax.sort((-av, ap), num_keys=2)
        return jnp.sort(ids[:, :k], axis=1)

    @jax.jit
    def sel_exact(b):
        return jnp.sort(jax.lax.top_k(b, k)[1], axis=1)

    timeit(f"select approx [T,{NB}]", sel_approx, bm)
    timeit(f"select exact top_k [T,{NB}]", sel_exact, bm)

    bids = sel_exact(bm)
    _force(bids)

    @jax.jit
    def gather(s, ids):
        s3 = s.reshape(T, NB, 128)
        return jnp.take_along_axis(s3, ids[:, :, None], axis=1)

    timeit("gather [T,k,128]", gather, sims, bids, iters=2)

    cand = gather(sims, bids).reshape(T, k * 128)
    _force(cand)

    @jax.jit
    def final(c):
        return jax.lax.top_k(c, k)

    timeit("final top_k [T,12800]", final, cand)

    del sims, cand

    # whole engine at the planned config
    fn = eng._get_fn(1024, k)
    qb = jax.random.normal(jax.random.PRNGKey(2), (1024, D), jnp.float32)
    dt = timeit("engine full batch 1024", fn, data, jax.device_put(qb))
    print(f"  -> {1024 / dt:,.0f} q/s", flush=True)


if __name__ == "__main__":
    main()
