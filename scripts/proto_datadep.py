"""Why is the rescore tile slower on the bench's data than on raw noise?

proto_tail (unnormalized gaussian store, random queries): 5.19 ms/tile at
sub=64/gd=8. proto_engine2 (normalized store, self-retrieval queries):
5.86. Same shapes — so either a lax.cond fallback fires (certificate /
danger overflow) or the danger gather's REAL (non-dummy) traffic is
data-dependent. 2x2 in one process:

  store: unnormalized  vs normalized (bench construction)
  queries: random      vs self-retrieval rows
plus the old sub=32 geometry on the bench cell, and a gd=16 probe.

Usage: python scripts/proto_datadep.py [reps=12] [rounds=3]
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

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
K, Q = 100, 512
R = 1_015_808
VALID = 1_000_000
D = 768


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    norm = (raw.astype(jnp.float32)
            / jnp.linalg.norm(raw.astype(jnp.float32), axis=1,
                              keepdims=True)).astype(jnp.bfloat16)
    q_rand = jax.random.normal(jax.random.PRNGKey(1), (Q, D),
                               dtype=jnp.bfloat16)
    q_self = norm[jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)]
    _force(raw); _force(norm); _force(q_rand); _force(q_self)
    base = jnp.int32(0)

    def mk(sub, cpg, gd):
        def fn(qq, sh):
            return rescore_topk(
                sh, qq, K, base, VALID, q_tile=512, use_pallas=True,
                sub_block=sub, block=128, cpg=cpg, argmax_fast=True,
                danger_units=gd,
            )
        return jax.jit(fn)

    f64 = mk(64, 4, 8)
    f64g16 = mk(64, 4, 16)
    f32g = mk(32, 8, 8)

    cells = [
        ("A u-store/r-q s64", lambda: f64(q_rand, raw)),
        ("B n-store/r-q s64", lambda: f64(q_rand, norm)),
        ("C n-store/self s64", lambda: f64(q_self, norm)),
        ("D n-store/self s32", lambda: f32g(q_self, norm)),
        ("E n-store/self gd16", lambda: f64g16(q_self, norm)),
    ]
    for nm, fn in cells:
        _force(fn())
        print(f"{nm}: compiled", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    best = {n: 1e9 for n, _ in cells}
    for rnd in range(ROUNDS):
        out = tiny(q_rand); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(q_rand)
        _force(out)
        sync = (time.perf_counter() - t0) / REPS
        for n, fn in cells:
            out = fn()
            _force(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn()
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n.split()[0]}={best[n]*1e3:.2f}" for n, _ in cells),
              flush=True)
    for n, _ in cells:
        print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
