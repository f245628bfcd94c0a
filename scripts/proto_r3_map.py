"""Is the 1024-query batch paying lax.map overhead over 2x the 512 tile?

A/B in one process: rescore_topk(Q=1024) (2 tiles via lax.map) vs an
UNROLLED variant (tile_fn called twice, results stacked) vs 2 separate
Q=512 dispatches. If unrolled < map, the op should unroll small tile
counts; if both equal 2x the single tile, the engine overhead lives in
the shard_map/dispatch layer instead.

Usage: python scripts/proto_r3_map.py [reps=12] [rounds=4]
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
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K = 100
R, VALID, D = 1_015_808, 1_000_000, 768


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1]))


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R, D), jnp.bfloat16)
    norm = raw.astype(jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    store = norm.astype(jnp.bfloat16)
    del raw, norm
    sel = jnp.linspace(0, VALID - 1, 1024).astype(jnp.int32)
    q1024 = store[sel]
    q512a, q512b = q1024[:512], q1024[512:]

    def call(sh, qq):
        return rescore_topk(
            sh, qq, K, jnp.int32(0), VALID, q_tile=512, use_pallas=True,
            sub_block=64, block=128, cpg=4, argmax_fast=True,
            danger_units=4,
        )

    map_fn = jax.jit(call)

    def unrolled(sh, qa, qb):
        va, ia = call(sh, qa)
        vb, ib = call(sh, qb)
        return jnp.concatenate([va, vb]), jnp.concatenate([ia, ib])

    unroll_fn = jax.jit(unrolled)
    single_fn = jax.jit(call)

    cells = [
        ("map1024", lambda: map_fn(store, q1024)),
        ("unroll1024", lambda: unroll_fn(store, q512a, q512b)),
        ("single512", lambda: single_fn(store, q512a)),
    ]
    outs = {}
    for nm, fn in cells:
        out = fn()
        _force(out)
        outs[nm] = np.asarray(jax.device_get(out[1]))
        print(f"{nm}: compiled", flush=True)
    print("map == unroll ids:",
          np.array_equal(outs["map1024"], outs["unroll1024"]), flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    best = {n: 1e9 for n, _ in cells}
    for rnd in range(ROUNDS):
        out = tiny(q1024); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(q1024)
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
              " ".join(f"{n}={best[n]*1e3:.2f}" for n, _ in cells),
              flush=True)
    for n, _ in cells:
        print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
