"""Pool-gather formulation sweep (the 2 x 65 MB scans in group selection).

take_along_axis on [T, ng, gw] runs at ~138 GB/s of source bytes; this
measures whether other formulations of the same gather reach the ~310 GB/s
other shapes see.

  G0  3-D take_along_axis (current)
  G1  2-D take_along_axis on the flat [T, nsub] view, indices expanded
  G2  G0 with mode='promise_in_bounds'
  G3  G1 with mode='promise_in_bounds'
  G4  both sources (bms+key) stacked on a leading axis, ONE 4-D gather

Usage: python scripts/proto_sel7.py
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
nsub = 31744
gw = 32
ng = nsub // gw          # 992
kg = 100
pool = kg * gw


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def g0(bms, key, gids):
    s3 = bms.reshape(t, ng, gw)
    return jnp.take_along_axis(s3, gids[:, :, None], axis=1)


def g1(bms, key, gids):
    idx = (gids[:, :, None] * gw
           + jnp.arange(gw, dtype=jnp.int32)[None, None, :]).reshape(t, pool)
    return jnp.take_along_axis(bms, idx, axis=1)


def g2(bms, key, gids):
    s3 = bms.reshape(t, ng, gw)
    return jnp.take_along_axis(s3, gids[:, :, None], axis=1,
                               mode="promise_in_bounds")


def g3(bms, key, gids):
    idx = (gids[:, :, None] * gw
           + jnp.arange(gw, dtype=jnp.int32)[None, None, :]).reshape(t, pool)
    return jnp.take_along_axis(bms, idx, axis=1, mode="promise_in_bounds")


def g0_both(bms, key, gids):
    a = jnp.take_along_axis(bms.reshape(t, ng, gw), gids[:, :, None], axis=1)
    b = jnp.take_along_axis(key.reshape(t, ng, gw), gids[:, :, None], axis=1)
    return a, b


def g4_both(bms, key, gids):
    src = jnp.stack([bms.reshape(t, ng, gw),
                     key.reshape(t, ng, gw).view(jnp.float32)], axis=2)
    out = jnp.take_along_axis(src, gids[:, :, None, None], axis=1,
                              mode="promise_in_bounds")
    return out[:, :, 0], out[:, :, 1].view(jnp.int32)


def main():
    bms = jax.random.normal(jax.random.PRNGKey(0), (t, nsub),
                            dtype=jnp.float32)
    key = jax.random.randint(jax.random.PRNGKey(1), (t, nsub), 0, 1 << 30,
                             dtype=jnp.int32)
    gids = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(2), (t, kg), 0, ng,
                           dtype=jnp.int32), axis=1)
    _force(bms); _force(key); _force(gids)

    variants = [
        ("G0 3d take", jax.jit(g0)),
        ("G1 2d take", jax.jit(g1)),
        ("G2 3d pib", jax.jit(g2)),
        ("G3 2d pib", jax.jit(g3)),
        ("B0 two takes", jax.jit(g0_both)),
        ("B4 stacked 4d", jax.jit(g4_both)),
    ]
    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    for n, fn in variants:
        _force(fn(bms, key, gids))
    # agreement
    ref = np.asarray(jax.device_get(g0(bms, key, gids)))
    for n, fn in variants[1:4]:
        out = np.asarray(jax.device_get(fn(bms, key, gids))).reshape(ref.shape)
        print(f"{n} == G0: {np.array_equal(out, ref)}", flush=True)

    best = {n: 1e9 for n, _ in variants}
    sync_best = 1e9
    for rnd in range(3):
        out = tiny(bms); _force(out)
        t0 = time.perf_counter()
        for _ in range(24):
            out = tiny(bms)
        _force(out)
        sync_best = min(sync_best, (time.perf_counter() - t0) / 24)
        for n, fn in variants:
            out = fn(bms, key, gids)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(24):
                out = fn(bms, key, gids)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / 24)
        print(f"round {rnd} sync={sync_best*1e3:.2f}", flush=True)
    for n, _ in variants:
        v = (best[n] - sync_best) * 1e3
        print(f"{n:>14s}: {v:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
