"""lax.map vs Python-unrolled query tiles for rescore_topk (1M x 768).

proto_engine.py (post refine-tail rewrite) measured raw T=512 = 5.98 ms
but the 2-tile lax.map form at 12.58 — the scan adds ~0.62 ms of
bookkeeping per batch. A 2-iteration map is exactly where unrolling is
free (no compile-time blowup) and XLA can drop the scan carries.

Usage: python scripts/proto_unroll.py
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

R, D, k, t = 1_000_000, 768, 100, 512


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1]))


def main():
    shard = jax.random.normal(jax.random.PRNGKey(0), (1_015_808, D),
                              dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (1024, D),
                          dtype=jnp.bfloat16)
    _force(shard); _force(q)

    kw = dict(use_pallas=True, block=128, sub_block=32, cpg=8,
              argmax_fast=True)

    def mapped(qq, sh):
        return rescore_topk(sh, qq, k, jnp.int32(0), R, q_tile=t, **kw)

    def unrolled(qq, sh):
        outs = [rescore_topk(sh, qq[i * t:(i + 1) * t], k, jnp.int32(0), R,
                             q_tile=t, **kw) for i in range(2)]
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))

    cases = [("lax.map", jax.jit(mapped)), ("unrolled", jax.jit(unrolled))]
    outs = []
    for n, fn in cases:
        out = fn(q, shard)
        _force(out)
        outs.append(out)
        print("compiled", n, flush=True)
    print("ids equal:", bool(jnp.all(outs[0][1] == outs[1][1])), flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    best = {n: 1e9 for n, _ in cases}
    sync = 1e9
    for rnd in range(3):
        out = tiny(q); _force(out)
        t0 = time.perf_counter()
        for _ in range(12):
            out = tiny(q)
        _force(out)
        sync = min(sync, (time.perf_counter() - t0) / 12)
        for n, fn in cases:
            out = fn(q, shard)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(12):
                out = fn(q, shard)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / 12)
        print(f"round {rnd} sync={sync*1e3:.2f}: " + " | ".join(
            f"{n}: {best[n]*1e3:.2f}" for n, _ in cases), flush=True)
    for n, _ in cases:
        print(f"{n:>10s}: {(best[n]-sync)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
