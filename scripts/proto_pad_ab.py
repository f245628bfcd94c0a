"""DECISION-GRADE in-process A/B: round-5 production tail vs round-6 knobs.

Cross-process relay drift (±5-15% observed) contaminated the first
dummy-pad measurements; this sweep holds everything in one process on the
bench's data distribution (normalized store, self-retrieval queries):

  P0  sub=32 gd=8 pad=off  (round-5 production, bit-faithful)
  P1  sub=32 gd=8 pad=on   (isolates the dummy-id DMA-skip)
  P2  sub=64 gd=8 pad=on   (round-6 production candidate)
  P3  sub=64 gd=4 pad=on   (tight capacity)

Usage: python scripts/proto_pad_ab.py [reps=16] [rounds=6]
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

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
K, Q = 100, 512
R, VALID, D = 1_015_808, 1_000_000, 768


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    norm = (raw.astype(jnp.float32)
            / jnp.linalg.norm(raw.astype(jnp.float32), axis=1,
                              keepdims=True)).astype(jnp.bfloat16)
    del raw
    q = norm[jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)]
    _force(norm); _force(q)
    base = jnp.int32(0)

    def mk(sub, cpg, gd):
        def fn(qq, sh):
            return rescore_topk(
                sh, qq, K, base, VALID, q_tile=512, use_pallas=True,
                sub_block=sub, block=128, cpg=cpg, argmax_fast=True,
                danger_units=gd,
            )
        return jax.jit(fn)

    # (The original run also A/B'd a dummy-id danger-padding variant —
    # measured EXACTLY zero effect, 5.53 ms both ways, so the code and its
    # knob were removed; see docs/DESIGN.md round 6.)
    cells = [
        ("P0 s32 gd8", mk(32, 8, 8)),
        ("P2 s64 gd8", mk(64, 4, 8)),
        ("P3 s64 gd4", mk(64, 4, 4)),
    ]
    outs = []
    for nm, fn in cells:
        v, i = fn(q, norm)
        outs.append((np.asarray(jax.device_get(v)),
                     np.asarray(jax.device_get(i))))
        print(f"{nm}: compiled", flush=True)
    for (nm, _), (v, i) in zip(cells[1:], outs[1:]):
        same = np.array_equal(outs[0][0], v) and np.array_equal(outs[0][1], i)
        print(f"identical P0 vs {nm.split()[0]}: {same}", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    best = {n: 1e9 for n, _ in cells}
    for rnd in range(ROUNDS):
        out = tiny(q); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(q)
        _force(out)
        sync = (time.perf_counter() - t0) / REPS
        for n, fn in cells:
            out = fn(q, norm)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(q, norm)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n.split()[0]}={best[n]*1e3:.2f}" for n, _ in cells),
              flush=True)
    for n, _ in cells:
        print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
