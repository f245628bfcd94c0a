"""Final-merge formulation A/B: wide two-key sort vs danger pre-reduce.

10M geometry: A-candidates ks=100 + danger rows gd*sub=1024.
  V0  lax.sort two-key over [512, 1124]
  V1  _fast_topk(danger, 100) + two-key sort over [512, 200]
1M geometry (gd*sub=256):
  V2  sort [512, 356]   V3  topk+sort [512, 200]

Usage: python scripts/proto_dsort.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops.topk import _fast_topk

t, k, ks = 512, 100, 100


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def wide_sort(vals, a_ids, d_sims, d_ids):
    c_vals = jnp.concatenate([vals, d_sims], axis=1)
    c_ids = jnp.concatenate([a_ids, d_ids], axis=1)
    neg, ids = jax.lax.sort((-(c_vals + 0.0), c_ids), num_keys=2)
    return -neg[:, :k], ids[:, :k]


def prereduce_sort(vals, a_ids, d_sims, d_ids):
    dv, dp = _fast_topk(d_sims, k)
    di = jnp.take_along_axis(d_ids, dp, axis=1)
    c_vals = jnp.concatenate([vals, dv], axis=1)
    c_ids = jnp.concatenate([a_ids, di], axis=1)
    neg, ids = jax.lax.sort((-(c_vals + 0.0), c_ids), num_keys=2)
    return -neg[:, :k], ids[:, :k]


def main():
    rng = jax.random.PRNGKey(0)
    cases = []
    for name, dw in (("10m gd*sub=1024", 1024), ("1m gd*sub=256", 256)):
        vals = jnp.sort(jax.random.normal(rng, (t, ks)), axis=1)[:, ::-1]
        a_ids = jax.random.randint(rng, (t, ks), 0, 1 << 22, dtype=jnp.int32)
        d_sims = jax.random.normal(jax.random.PRNGKey(1), (t, dw))
        d_ids = jax.random.randint(jax.random.PRNGKey(2), (t, dw), 0, 1 << 22,
                                   dtype=jnp.int32)
        a = (vals, a_ids, d_sims, d_ids)
        cases.append((f"{name} wide", jax.jit(wide_sort), a))
        cases.append((f"{name} prered", jax.jit(prereduce_sort), a))

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    for n, fn, a in cases:
        _force(fn(*a))
    best = {n: 1e9 for n, _, _ in cases}
    syncs = []
    for rnd in range(4):
        out = tiny(cases[0][2][0]); _force(out)
        t0 = time.perf_counter()
        for _ in range(24):
            out = tiny(cases[0][2][0])
        _force(out)
        sync = (time.perf_counter() - t0) / 24
        syncs.append(sync)
        for n, fn, a in cases:
            out = fn(*a)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(24):
                out = fn(*a)
            _force(out)
            dt = (time.perf_counter() - t0) / 24 - sync
            best[n] = min(best[n], dt)
        print(f"round {rnd} sync={sync*1e3:.2f}", flush=True)
    for n, _, _ in cases:
        print(f"{n:>22s}: {best[n]*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
