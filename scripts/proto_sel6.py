"""Full rescore_topk A/B under the group-selection stack (chip).

Times one [512]-query tile end-to-end (argmax fast path) at:
  * 1M x 768 bf16, sub=32 vs sub=64 (the refine sources halve at 64)
  * 10M x 256 bf16, sub=128/block=1024 (set TENM=0 to skip)

Interleaved min-of-rounds with the sync floor subtracted.
Usage: python scripts/proto_sel6.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops.topk import rescore_topk


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def bench(cases, rounds=3, iters=12):
    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    probe = jnp.zeros((8, 8), jnp.float32)
    for _n, fn, a in cases:
        _force(fn(*a))
    best = {n: 1e9 for n, _, _ in cases}
    sync_best = 1e9
    for rnd in range(rounds):
        out = tiny(probe); _force(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = tiny(probe)
        _force(out)
        sync_best = min(sync_best, (time.perf_counter() - t0) / iters)
        for n, fn, a in cases:
            out = fn(*a)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*a)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / iters)
        print(f"round {rnd} sync={sync_best*1e3:.2f}: " + " | ".join(
            f"{n}: {best[n]*1e3:.2f}" for n, _, _ in cases), flush=True)
    for n, _, _ in cases:
        v = (best[n] - sync_best) * 1e3
        print(f"{n:>24s}: {v:7.2f} ms  ({512/v*1000:.0f} q/s/tile)",
              flush=True)


def main():
    t = 512
    k = 100

    def mk(sub, block, cpg, valid, shard, q):
        def fn(qq, sh):
            return rescore_topk(sh, qq, k, jnp.int32(0), valid,
                                q_tile=t, use_pallas=True, block=block,
                                sub_block=sub, cpg=cpg, argmax_fast=True)

        return jax.jit(fn), (q, shard)

    cases = []
    R1, D1 = 1_015_808, 768
    shard1 = jax.random.normal(jax.random.PRNGKey(0), (R1, D1),
                               dtype=jnp.bfloat16)
    q1 = jax.random.normal(jax.random.PRNGKey(1), (t, D1),
                           dtype=jnp.bfloat16)
    _force(shard1); _force(q1)
    for sub in (32, 64):
        fn, a = mk(sub, 128, 8, 1_000_000, shard1, q1)
        cases.append((f"1m768 sub={sub}", fn, a))

    if os.environ.get("TENM", "1") != "0":
        R2, D2 = 10_485_760, 256
        shard2 = jax.random.normal(jax.random.PRNGKey(2), (R2, D2),
                                   dtype=jnp.bfloat16)
        q2 = jax.random.normal(jax.random.PRNGKey(3), (t, D2),
                               dtype=jnp.bfloat16)
        _force(shard2); _force(q2)
        fn, a = mk(128, 1024, 4, 10_000_000, shard2, q2)
        cases.append(("10m256 sub=128", fn, a))

    bench(cases)


if __name__ == "__main__":
    main()
