"""Pool top-k cost isolation (the 10M refine/key stage mystery).

Isolated takes at [81920, 512] are ~free, yet the composed stages cost
+2.7/+1.9 ms. Time the remaining suspects on clean inputs:

  A  _fast_topk([512, 6400], 100)    (approx+certificate path)
  B  lax.top_k([512, 6400], 100)
  D  approx_max_k([512, 6400], 200) alone
  C  full refine chain on clean inputs (take + _fast_topk + take)
  K  key chain (take + take_along pos)
  A1 _fast_topk([512, 3200], 104)    (1M pool, for reference)

Usage: python scripts/proto_sel9.py
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

t = 512
nsub = 81920
ng, gw, kg, ks = 1280, 64, 100, 100
pool = kg * gw


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def chain(bms_t, gids):
    bms3 = bms_t.T.reshape(t, ng, gw)
    cand_bm = jnp.take_along_axis(
        bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(t, pool)
    cand_uids = (
        gids[:, :, None] * gw
        + jnp.arange(gw, dtype=jnp.int32)[None, None, :]
    ).reshape(t, pool)
    vals, pos = _fast_topk(cand_bm, ks)
    uids = jnp.take_along_axis(cand_uids, pos, axis=1)
    return vals, uids, pos


def chain_barrier(bms_t, gids):
    bms3 = bms_t.T.reshape(t, ng, gw)
    cand_bm = jnp.take_along_axis(
        bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(t, pool)
    cand_bm = jax.lax.optimization_barrier(cand_bm)
    cand_uids = (
        gids[:, :, None] * gw
        + jnp.arange(gw, dtype=jnp.int32)[None, None, :]
    ).reshape(t, pool)
    vals, pos = _fast_topk(cand_bm, ks)
    uids = jnp.take_along_axis(cand_uids, pos, axis=1)
    return vals, uids, pos


def keychain_barrier(key_t, gids, pos):
    key3 = key_t.T.reshape(t, ng, gw)
    cand_key = jnp.take_along_axis(
        key3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(t, pool)
    cand_key = jax.lax.optimization_barrier(cand_key)
    return jnp.take_along_axis(cand_key, pos, axis=1)


def keychain(key_t, gids, pos):
    key3 = key_t.T.reshape(t, ng, gw)
    cand_key = jnp.take_along_axis(
        key3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(t, pool)
    return jnp.take_along_axis(cand_key, pos, axis=1)


def main():
    bms_t = jax.random.normal(jax.random.PRNGKey(0), (nsub, t),
                              dtype=jnp.float32)
    key_t = jax.random.randint(jax.random.PRNGKey(1), (nsub, t), 0, 1 << 30,
                               dtype=jnp.int32)
    gids = jnp.sort(jax.random.randint(
        jax.random.PRNGKey(2), (t, kg), 0, ng, dtype=jnp.int32), axis=1)
    p6400 = jax.random.normal(jax.random.PRNGKey(3), (t, pool),
                              dtype=jnp.float32)
    p3200 = jax.random.normal(jax.random.PRNGKey(4), (t, 3200),
                              dtype=jnp.float32)
    pos = jnp.sort(jax.random.randint(
        jax.random.PRNGKey(5), (t, ks), 0, pool, dtype=jnp.int32), axis=1)
    for x in (bms_t, key_t, gids, p6400, p3200, pos):
        _force(x)

    cases = [
        ("A fast_topk 6400", jax.jit(lambda a, b: _fast_topk(a, ks)),
         (p6400, gids)),
        ("B top_k 6400", jax.jit(lambda a, b: jax.lax.top_k(a, ks)),
         (p6400, gids)),
        ("D approx 6400", jax.jit(
            lambda a, b: jax.lax.approx_max_k(a, 200, recall_target=1.0)),
         (p6400, gids)),
        ("C refine chain", jax.jit(chain), (bms_t, gids)),
        ("K key chain", jax.jit(lambda a, b: keychain(a, b, pos)),
         (key_t, gids)),
        ("A1 fast_topk 3200", jax.jit(lambda a, b: _fast_topk(a, 104)),
         (p3200, gids)),
        ("C2 chain+barrier", jax.jit(chain_barrier), (bms_t, gids)),
        ("K2 key+barrier", jax.jit(lambda a, b: keychain_barrier(a, b, pos)),
         (key_t, gids)),
    ]
    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    for n, fn, a in cases:
        _force(fn(*a))
    best = {n: 1e9 for n, _, _ in cases}
    for rnd in range(4):
        out = tiny(p6400); _force(out)
        t0 = time.perf_counter()
        for _ in range(24):
            out = tiny(p6400)
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
