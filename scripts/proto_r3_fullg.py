"""A/B the argmax fast path vs the emission-free FULL GATHER at the
10M x 256 int8 geometry, interleaved in one process.

Rationale: the int8 m2/argmax emission costs +5.4 ms per tile at 256-d
(docs/DESIGN.md round-8 isolation — the VPU passes cannot hide under the
halved-depth MXU dot), while the full gather it replaces moves only
~ks*sub*dim bytes/query (~1.7 GB/tile at sub=128 -> ~2 ms of DMA). If
bms-only + full gather beats bm2+argmax+danger, the engine should route
int8 low-dim stores to the full-gather variant.

Usage: python scripts/proto_r3_fullg.py [reps=8] [rounds=4]
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

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K, Q = 100, 512
VALID, D = 10_000_000, 256
R = 10_158_080  # multiple of 2048 and 1024


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def build_store():
    """Chunked on-device int8 store build (normalize + lattice quantize)."""
    from better_search_rag_rust_tpu.ops.quantize import quantize_unit

    data = jax.jit(lambda: jnp.zeros((R, D), jnp.int8))()
    fill = 1_015_808

    @jax.jit
    def fill_chunk(buf, key, start):
        x = jax.random.normal(key, (fill, D), dtype=jnp.float32)
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        x = x / jnp.where(n == 0.0, 1.0, n)
        return jax.lax.dynamic_update_slice(buf, quantize_unit(x), (start, 0))

    key = jax.random.PRNGKey(0)
    for i in range(R // fill):
        key, sub = jax.random.split(key)
        data = fill_chunk(data, sub, jnp.int32(i * fill))
    _force(data)
    return data


def main():
    store = build_store()
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
    queries = store[sel]
    _force(queries)

    cells = []

    def cell(name, **kw):
        fn = jax.jit(lambda qq, sh: rescore_topk(
            sh, qq, K, jnp.int32(0), VALID, q_tile=512, use_pallas=True,
            block=1024, **kw,
        ))
        cells.append((name, fn))

    cell("af_prod", sub_block=128, cpg=4, argmax_fast=True, danger_units=4)
    cell("fullg_128", sub_block=128, cpg=4, argmax_fast=False)
    cell("fullg_128c2", sub_block=128, cpg=2, argmax_fast=False)

    outs = {}
    for nm, fn in cells:
        out = fn(queries, store)
        _force(out)
        outs[nm] = np.asarray(jax.device_get(out[1]))
        print(f"{nm}: compiled", flush=True)
    for nm in outs:
        if not np.array_equal(outs[nm], outs["af_prod"]):
            print(f"MISMATCH {nm} vs af_prod!", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1)
    best = {n: 1e9 for n, _ in cells}
    for rnd in range(ROUNDS):
        out = tiny(queries); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(queries)
        _force(out)
        sync = (time.perf_counter() - t0) / REPS
        for n, fn in cells:
            out = fn(queries, store)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(queries, store)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n}={best[n]*1e3:.2f}" for n, _ in cells), flush=True)
    for n, _ in cells:
        print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
