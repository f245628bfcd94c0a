"""A/B the argmax-path tail knobs on chip: sub width x danger capacity.

The refine-tail rewrite left the 1M x 768 tile at ~5.8 ms against the
4.37 ms bm-pass floor. Remaining tail: two [T, R/sub] source scans
(~0.42 ms per 64 MB at sub=32) + the danger gather (gd=8 units x 48 KB
x 512 queries ~ 200 MB/tile) + the final two-key sort. Variants:

  V0  sub=32 gd=8   (current production geometry)
  V1  sub=32 gd=4   (halve the danger gather)
  V2  sub=64 gd=4   (halve both source scans; danger bytes = V0)
  V3  sub=64 gd=8

All variants are EXACT — identical (vals, ids) is asserted before timing.
Interleaved same-process rounds, min over rounds, tiny-dispatch sync
calibration (cross-process relay drift is +-5%, CLAUDE.md).

Usage: python scripts/proto_tail.py [q=512] [reps=16] [rounds=5]
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

VALID, D = 1_000_000, 768
R = VALID + (-VALID) % 2048  # engine stores pad per-device rows to the scan
K = 100                      # chunk, which keeps the rt=2048 bm tile legal
Q = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 5


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def main():
    shard = jax.random.normal(jax.random.PRNGKey(0), (R, D),
                              dtype=jnp.bfloat16)
    shard = (
        shard.astype(jnp.float32)
        / jnp.linalg.norm(shard.astype(jnp.float32), axis=1, keepdims=True)
    ).astype(jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (Q, D), dtype=jnp.bfloat16)
    _force(shard); _force(q)
    base = jnp.int32(0)

    def make(sub, gd, cpg):
        def fn(qq, sh):
            return rescore_topk(
                sh, qq, K, base, VALID, q_tile=512, use_pallas=True,
                sub_block=sub, block=128, cpg=cpg,
                argmax_fast=True, danger_units=gd,
            )
        return jax.jit(fn)

    fns = [
        ("V0 sub32 gd8", make(32, 8, 8)),
        ("V1 sub32 gd4", make(32, 4, 8)),
        ("V2 sub64 gd4", make(64, 4, 4)),
        ("V3 sub64 gd8", make(64, 8, 4)),
    ]

    outs = []
    for nm, fn in fns:
        v, i = fn(q, shard)
        outs.append((np.asarray(jax.device_get(v)),
                     np.asarray(jax.device_get(i))))
        print(f"{nm}: compiled", flush=True)
    for (nm, _), (v, i) in zip(fns[1:], outs[1:]):
        same = np.array_equal(outs[0][0], v) and np.array_equal(outs[0][1], i)
        print(f"identical V0 vs {nm.split()[0]}: {same}", flush=True)
        if not same:
            bad = np.nonzero(~(outs[0][1] == i).all(axis=1))[0][:4]
            print(f"  first differing queries: {bad}", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    best = {n: 1e9 for n, _ in fns}
    for rnd in range(ROUNDS):
        out = tiny(q); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(q)
        _force(out)
        sync = (time.perf_counter() - t0) / REPS
        for n, fn in fns:
            out = fn(q, shard)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(q, shard)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n.split()[0]}={best[n]*1e3:.2f}" for n, _ in fns),
              flush=True)
    for n, _ in fns:
        qps = Q / best[n]
        print(f"{n}: {best[n]*1e3:.2f} ms  ({qps/1e3:.1f}k q/s at Q={Q})",
              flush=True)


if __name__ == "__main__":
    main()
