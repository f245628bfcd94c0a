"""Does candidate-gather cost scale with source width NB?

take_along_axis showed ~130 ns/slice at NB=8k but ~414 ns at NB=26k —
perfectly linear in NB, i.e. XLA lowers it as an O(NB) masked reduction per
output, not a real gather. vmap(scan(dynamic_slice)) should be NB-flat.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def timeit(label, fn, *args, iters=6):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:>46s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    T, B, k = 256, 128, 100
    key = jax.random.PRNGKey(0)
    for NB in (7936, 26112, 78336):
        sims = jax.random.normal(key, (T, NB * B), dtype=jnp.float32)
        bids = jnp.sort(
            jax.random.randint(key, (T, k), 0, NB, dtype=jnp.int32), axis=1
        )
        _force(sims); _force(bids)

        @jax.jit
        def tala(s, ids):
            s3 = s.reshape(T, NB, B)
            return jnp.take_along_axis(s3, ids[:, :, None], axis=1)

        @jax.jit
        def vds(s, ids):
            s3 = s.reshape(T, NB, B)

            def per_query(row, rid):
                def step(_, j):
                    return None, jax.lax.dynamic_slice(
                        row, (rid[j], 0), (1, B))[0]
                _, out = jax.lax.scan(step, None, jnp.arange(k))
                return out

            return jax.vmap(per_query)(s3, ids)

        @jax.jit
        def flat_ds(s, ids):
            # dynamic_slice on the FLAT [T*NB*B] array, scan over T*k slots
            flat = s.reshape(T * NB * B)
            starts = ((jnp.arange(T, dtype=jnp.int32)[:, None] * NB + ids)
                      .reshape(-1) * B)

            def step(_, st):
                return None, jax.lax.dynamic_slice(flat, (st,), (B,))
            _, out = jax.lax.scan(step, None, starts)
            return out.reshape(T, k, B)

        t1 = timeit(f"NB={NB:>6} take_along_axis", tala, sims, bids)
        t2 = timeit(f"NB={NB:>6} vmap(scan(dyn_slice))", vds, sims, bids)
        t3 = timeit(f"NB={NB:>6} scan(flat dyn_slice)", flat_ds, sims, bids)
        # correctness cross-check
        a = jax.device_get(tala(sims, bids))
        b = jax.device_get(vds(sims, bids))
        c = jax.device_get(flat_ds(sims, bids))
        assert np.array_equal(a, b) and np.array_equal(a, c)
        del sims


if __name__ == "__main__":
    main()
