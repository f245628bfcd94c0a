"""Two-hop candidate gather: per-slice cost ~ 30ns + 16ps * source_width,
so gathering g-block super-blocks first (width NB/g) then selecting the
block within each (width g) should beat one flat gather at large NB."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def timeit(label, fn, *args, iters=8):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:>44s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    B, k = 128, 100
    key = jax.random.PRNGKey(0)
    for T, NB in ((256, 26112), (256, 7936), (512, 7936)):
        sims = jax.random.normal(key, (T, NB * B), dtype=jnp.float32)
        bids = jnp.sort(
            jax.random.randint(key, (T, k), 0, NB, dtype=jnp.int32), axis=1
        )
        _force(sims); _force(bids)

        @jax.jit
        def flat(s, ids):
            s3 = s.reshape(T, NB, B)
            return jnp.take_along_axis(s3, ids[:, :, None], axis=1)

        @functools.partial(jax.jit, static_argnames=("g",))
        def twohop(s, ids, g=16):
            nbg = NB // g
            s4 = s.reshape(T, nbg, g * B)
            sup = ids // g
            inner = ids % g
            hop1 = jnp.take_along_axis(s4, sup[:, :, None], axis=1)
            hop2 = jnp.take_along_axis(
                hop1.reshape(T, k, g, B), inner[:, :, None, None], axis=2
            )
            return hop2.reshape(T, k, B)

        t_flat = timeit(f"T={T} NB={NB:>6} flat", flat, sims, bids)
        ref = jax.device_get(flat(sims, bids))
        for g in (8, 16, 32):
            if NB % g:
                continue
            t2 = timeit(f"T={T} NB={NB:>6} twohop g={g}",
                        lambda s, i, _g=g: twohop(s, i, g=_g), sims, bids)
            got = jax.device_get(twohop(sims, bids, g=g))
            assert np.array_equal(ref, got), f"mismatch g={g}"
        del sims


if __name__ == "__main__":
    main()
