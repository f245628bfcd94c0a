"""Engine-vs-raw-op overhead decomposition (1M x 768, chip).

bench.py reports ~15.3 ms/1024-query batch while the raw rescore_topk
tile measures 6.13 ms (x2 = 12.3). This times, under one interleaved
protocol: the raw op at T=512, the raw op wrapped in lax.map over 2
tiles of a 1024 batch, the full engine program (normalize + cast +
barrier + shard_map + merge), and the engine's Python dispatch path.

Usage: python scripts/proto_engine.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.config import SearchConfig
from better_search_rag_rust_tpu.ops.engine import SearchEngine
from better_search_rag_rust_tpu.ops.topk import rescore_topk
from better_search_rag_rust_tpu.parallel.mesh import create_mesh
from better_search_rag_rust_tpu.store.device_store import DeviceStore

R, D, k = 1_000_000, 768, 100


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def main():
    mesh = create_mesh()
    rng = np.random.default_rng(0)
    host = rng.standard_normal((R, D)).astype(np.float32)
    store = DeviceStore.from_host(host, mesh, dtype="bfloat16")
    eng = SearchEngine(store, SearchConfig(top_k=k))
    shard = store.data          # [Rpad, 768] bf16 on 1 device
    rpad = shard.shape[0]
    print("kernel:", eng.kernel_name(k), "rpad:", rpad, flush=True)

    q1024 = rng.standard_normal((1024, D)).astype(np.float32)
    qdev = eng.prepare_device_queries(q1024)        # f32 [1024, 768]
    qb = jnp.asarray(q1024[:512]).astype(jnp.bfloat16)
    _force(qdev); _force(qb)

    def raw512(qq, sh):
        return rescore_topk(sh, qq, k, jnp.int32(0), R, q_tile=512,
                            use_pallas=True, block=128, sub_block=32,
                            cpg=8, argmax_fast=True)

    def raw1024(qq, sh):
        # same internal lax.map tiling as the engine (q_tile=512)
        qc = qq.astype(jnp.bfloat16)
        return rescore_topk(sh, qc, k, jnp.int32(0), R, q_tile=512,
                            use_pallas=True, block=128, sub_block=32,
                            cpg=8, argmax_fast=True)

    def engine_call(qq, sh):
        del sh
        return eng.search_device(qq, k=k)

    cases = [
        ("raw op T=512", jax.jit(raw512), (qb, shard)),
        ("raw op Q=1024 (map)", jax.jit(raw1024), (qdev, shard)),
        ("engine.search_device", engine_call, (qdev, shard)),
    ]
    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    for n, fn, a in cases:
        _force(fn(*a))
    best = {n: 1e9 for n, _, _ in cases}
    sync_best = 1e9
    for rnd in range(3):
        out = tiny(qb); _force(out)
        t0 = time.perf_counter()
        for _ in range(12):
            out = tiny(qb)
        _force(out)
        sync_best = min(sync_best, (time.perf_counter() - t0) / 12)
        for n, fn, a in cases:
            out = fn(*a)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(12):
                out = fn(*a)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / 12)
        print(f"round {rnd} sync={sync_best*1e3:.2f}: " + " | ".join(
            f"{n}: {best[n]*1e3:.2f}" for n, _, _ in cases), flush=True)
    for n, _, _ in cases:
        print(f"{n:>24s}: {(best[n]-sync_best)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
