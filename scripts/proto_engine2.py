"""Locate the engine-vs-raw-op gap at 1M x 768 after the round-6 tail work.

proto_tail.py measured the raw rescore op at 5.19 ms/tile (sub=64, gd=8),
but the bench protocol only moved 13.0 -> 12.8 ms/batch. Interleave, on
the BENCH's exact store (normalized synthetic, chunk=16384) and
self-retrieval queries:

  E  engine.search_device        (full shard_map program, 2 tiles)
  R  raw rescore_topk, Q=1024    (2 tiles, engine geometry)
  R5 raw rescore_topk, Q=512     (1 tile — proto_tail comparison point)

Usage: python scripts/proto_engine2.py [reps=12] [rounds=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.bench.suite import synthetic_device_store
from better_search_rag_rust_tpu.config import SearchConfig
from better_search_rag_rust_tpu.ops.engine import SearchEngine
from better_search_rag_rust_tpu.ops.topk import rescore_topk
from better_search_rag_rust_tpu.parallel.mesh import create_mesh

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K = 100


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def main():
    mesh = create_mesh()
    store = synthetic_device_store(mesh, 1_000_000, 768, "bfloat16", 16384)
    engine = SearchEngine(store, SearchConfig(top_k=K, chunk_rows=16384))
    q_idx = np.linspace(0, 999_999, 1024, dtype=np.int64)
    queries = np.asarray(
        jax.device_get(store.data[jnp.asarray(q_idx)]), dtype=np.float32
    )
    qdev = engine.prepare_device_queries(queries)
    shard = store.data  # 1 device: the whole padded store
    print(f"shard {shard.shape} per_dev {store.per_device_rows}", flush=True)

    qd_b = jnp.asarray(queries, dtype=jnp.bfloat16)
    qd_b = (qd_b.astype(jnp.float32)
            / jnp.linalg.norm(qd_b.astype(jnp.float32), axis=1,
                              keepdims=True)).astype(jnp.bfloat16)
    base = jnp.int32(0)

    def raw(qq, sh):
        return rescore_topk(
            sh, qq, K, base, store.num_rows, q_tile=512, use_pallas=True,
            sub_block=64, block=128, cpg=4, argmax_fast=True,
            danger_units=8,
        )

    raw_j = jax.jit(raw)

    fns = [
        ("E engine", lambda: engine.search_device(qdev, k=K)),
        ("R raw1024", lambda: raw_j(qd_b, shard)),
        ("R5 raw512", lambda: raw_j(qd_b[:512], shard)),
    ]
    for nm, fn in fns:
        _force(fn())
        print(f"{nm}: compiled", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    best = {n: 1e9 for n, _ in fns}
    for rnd in range(ROUNDS):
        out = tiny(qd_b); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(qd_b)
        _force(out)
        sync = (time.perf_counter() - t0) / REPS
        for n, fn in fns:
            out = fn()
            _force(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn()
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n.split()[0]}={best[n]*1e3:.2f}" for n, _ in fns),
              flush=True)
    for n, _ in fns:
        print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
