"""Sub-unit width sweep for the argmax fast path (1M x 768 bench shape).

With the argmax path the ks selected units' ROWS are no longer gathered, so
larger sub no longer costs extraction bytes — it shrinks the [R/sub, T]
bms/arg/m2 gather sources instead (the dominant post-bm cost, measured
source-bytes-bound at ~138 GB/s). Danger rate grows ~linearly with sub
(k^2*(sub-1)/2rows per query) but stays far under the gd=8 capacity for the
headline configs.

Usage: python scripts/proto_subsweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops import topk as T

R, D, k, t = 1_015_808, 768, 100, 512
VALID = 1_000_000


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1]))


def main():
    shard = jax.random.normal(jax.random.PRNGKey(0), (R, D),
                              dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (t, D), dtype=jnp.bfloat16)
    _force(shard); _force(q)

    variants = [
        ("sub=32 (current)", 32, 128, 8),
        ("sub=64", 64, 128, 8),
        ("sub=128", 128, 128, 8),
        ("sub=128 blk256", 128, 256, 8),
    ]
    fns = []
    for name, sub, blk, cpg in variants:
        f = jax.jit(lambda qq, sh, sub=sub, blk=blk, cpg=cpg: T.rescore_topk(
            sh, qq, k, jnp.int32(0), VALID, q_tile=t, use_pallas=True,
            block=blk, sub_block=sub, cpg=cpg, argmax_fast=True))
        try:
            out = f(q, shard)
            _force(out)
            fns.append((name, f))
            print("compiled", name, flush=True)
        except Exception as e:
            print("FAILED", name, type(e).__name__, str(e)[:200], flush=True)

    outs = [fn(q, shard) for _, fn in fns]
    for (name, _), (v, i) in zip(fns[1:], outs[1:]):
        print(f"ids match vs current: {name}:",
              bool(jnp.all(i == outs[0][1])), flush=True)

    best = {n: 1e9 for n, _ in fns}
    for rnd in range(4):
        for n, fn in fns:
            out = fn(q, shard)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(16):
                out = fn(q, shard)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / 16)
        print(f"round {rnd}: " + " | ".join(
            f"{n}: {best[n]*1e3:.2f}" for n, _ in fns), flush=True)


if __name__ == "__main__":
    main()
