"""Sweep sims-buffer budgets / kernels for the 10M config on the real chip."""

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
from better_search_rag_rust_tpu.parallel.mesh import create_mesh


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def main():
    suite = SUITES["search_10m_mat256"]
    mesh = create_mesh()
    store = synthetic_device_store(
        mesh, suite.rows, suite.dim, suite.store_dtype, suite.chunk_rows
    )
    data = store.data
    k = 100
    qb = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (1024, data.shape[1]),
                          jnp.float32))
    _force(qb)

    for kernel, buf_gb in [
        ("pallas", 4), ("pallas", 2), ("pallas", 1),
        ("global", 8), ("global", 4), ("global", 2),
    ]:
        cfg = SearchConfig(top_k=k, kernel=kernel,
                           sims_buffer_bytes=buf_gb << 30)
        eng = SearchEngine(store, cfg)
        t, macro = eng._plan(1024, k)
        try:
            fn = eng._get_fn(1024, k)
            out = fn(data, qb)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(4):
                out = fn(data, qb)
            _force(out)
            dt = (time.perf_counter() - t0) / 4
            print(f"{kernel:>7s} buf={buf_gb}GB plan=(T={t}, macro={macro})"
                  f" -> {dt * 1e3:8.1f} ms  {1024 / dt:8,.0f} q/s", flush=True)
        except Exception as e:
            print(f"{kernel:>7s} buf={buf_gb}GB plan=(T={t}, macro={macro})"
                  f" FAILED: {type(e).__name__} {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
