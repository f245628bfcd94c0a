"""Interleaved cpg sweep on the FULL rescore_topk tile (1M x 768).

Relay noise makes isolated micro-timings unreliable (+-40% observed between
processes); this interleaves the variants round-robin within one process and
reports the per-variant MIN across rounds, which cancels drift.

Usage: python scripts/proto_cpg.py [1m|10m]
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


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "1m"
    if cfg == "10m":
        R, D, k, t = 10_000_000, 256, 100, 512
        variants = [
            ("sub=128 blk=1024 cpg=4 (current)", 128, 1024, 4),
            ("sub=128 blk=1024 cpg=8", 128, 1024, 8),
            ("sub=64 blk=512 cpg=8", 64, 512, 8),
            ("sub=64 blk=512 cpg=16", 64, 512, 16),
        ]
    else:
        R, D, k, t = 1_000_000, 768, 100, 512
        variants = [
            ("sub=16 blk=128 cpg=8 (current)", 16, 128, 8),
            ("sub=16 blk=128 cpg=16", 16, 128, 16),
            ("sub=16 blk=128 cpg=24", 16, 128, 24),
            ("sub=32 blk=256 cpg=8", 32, 256, 8),
        ]

    # Pre-pad rows like DeviceStore does: an unpadded shard makes
    # rescore_topk jnp.pad a multi-GB array INSIDE jit (second copy; the
    # documented 10M OOM dead end).
    rows_pad = R + (-R) % 1024
    shard = jax.random.normal(jax.random.PRNGKey(0), (rows_pad, D),
                              dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (t, D), dtype=jnp.bfloat16)
    _force(shard); _force(q)

    fns = []
    for name, sub, blk, cpg in variants:
        fn = jax.jit(lambda qq, sh, sub=sub, blk=blk, cpg=cpg: T.rescore_topk(
            sh, qq, k, jnp.int32(0), R, q_tile=t, use_pallas=True,
            block=blk, sub_block=sub, cpg=cpg))
        try:
            out = fn(q, shard)
            _force(out)
            fns.append((name, fn))
            print(f"compiled {name}", flush=True)
        except Exception as e:  # Mosaic VMEM rejection etc.
            print(f"FAILED {name}: {type(e).__name__} {str(e)[:160]}",
                  flush=True)

    # exactness cross-check between variants
    outs = [fn(q, shard) for _, fn in fns]
    ref_ids = outs[0][1]
    for (name, _), (vals, ids) in zip(fns[1:], outs[1:]):
        ok = bool(jnp.all(ids == ref_ids))
        print(f"ids match vs current: {name}: {ok}", flush=True)

    ITERS = 16
    ROUNDS = 4
    best = {name: float("inf") for name, _ in fns}
    # per-round C calibration on variant 0
    for rnd in range(ROUNDS):
        for name, fn in fns:
            out = fn(q, shard)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(q, shard)
            _force(out)
            dt = (time.perf_counter() - t0) / ITERS
            best[name] = min(best[name], dt)
        print(f"round {rnd}: " + " | ".join(
            f"{n}: {best[n]*1e3:.2f}" for n, _ in fns), flush=True)

    # subtract a C estimated from a tiny-op loop
    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    out = tiny(q); _force(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = tiny(q)
    _force(out)
    C = time.perf_counter() - t0
    print(f"sync overhead per loop ~{C*1e3:.1f} ms -> per iter "
          f"{C/ITERS*1e3:.2f} ms", flush=True)
    for name, _ in fns:
        print(f"{name:>36s}: {(best[name] - C/ITERS)*1e3:8.2f} ms/tile",
              flush=True)


if __name__ == "__main__":
    main()
