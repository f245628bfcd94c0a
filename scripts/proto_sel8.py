"""10M pool-gather diagnosis: transpose vs take at [81920, 512].

The 10M refine gather runs at ~61 GB/s of source bytes vs ~155 at the 1M
shape. Which half is slow, and does geometry help?

  P0  bms_t.T materialize alone (168 MB)
  P1  transpose + 3-D take (current form)
  P2  take only, from a pre-transposed resident [512, 81920] source
  P3  P1 at sup_w=16 (ng=640, gw=128)
  P4  P1 with f32 source replaced by int32 (same bytes; dtype effect?)

Usage: python scripts/proto_sel8.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

t = 512
nsub = 81920
kg = 100


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def take3(src_q, gids, ng, gw):
    s3 = src_q.reshape(t, ng, gw)
    return jnp.take_along_axis(s3, gids[:, :, None], axis=1,
                               mode="promise_in_bounds")


def main():
    bms_t = jax.random.normal(jax.random.PRNGKey(0), (nsub, t),
                              dtype=jnp.float32)
    bms_q = bms_t.T + 0.0
    key_t = jax.random.randint(jax.random.PRNGKey(1), (nsub, t), 0, 1 << 30,
                               dtype=jnp.int32)
    gids64 = jnp.sort(jax.random.randint(
        jax.random.PRNGKey(2), (t, kg), 0, nsub // 64, dtype=jnp.int32),
        axis=1)
    gids128 = jnp.sort(jax.random.randint(
        jax.random.PRNGKey(3), (t, kg), 0, nsub // 128, dtype=jnp.int32),
        axis=1)
    _force(bms_t); _force(bms_q); _force(key_t)
    _force(gids64); _force(gids128)

    cases = [
        ("P0 transpose", jax.jit(lambda s, g: s.T + 1.0), (bms_t, gids64)),
        ("P1 T+take gw=64", jax.jit(
            lambda s, g: take3(s.T, g, nsub // 64, 64)), (bms_t, gids64)),
        ("P2 take only", jax.jit(
            lambda s, g: take3(s, g, nsub // 64, 64)), (bms_q, gids64)),
        ("P3 T+take gw=128", jax.jit(
            lambda s, g: take3(s.T, g, nsub // 128, 128)), (bms_t, gids128)),
        ("P4 int32 T+take", jax.jit(
            lambda s, g: take3(s.T, g, nsub // 64, 64)), (key_t, gids64)),
    ]
    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    for n, fn, a in cases:
        _force(fn(*a))
    best = {n: 1e9 for n, _, _ in cases}
    for rnd in range(4):
        out = tiny(bms_q); _force(out)
        t0 = time.perf_counter()
        for _ in range(24):
            out = tiny(bms_q)
        _force(out)
        sync = (time.perf_counter() - t0) / 24
        for n, fn, a in cases:
            out = fn(*a)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(24):
                out = fn(*a)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / 24 - sync)
        print(f"round {rnd} sync={sync*1e3:.2f}", flush=True)
    for n, _, _ in cases:
        print(f"{n:>18s}: {best[n]*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
