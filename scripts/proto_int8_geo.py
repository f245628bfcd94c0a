"""DECISION-GRADE in-process A/B: int8 rescore geometry at 1M x 768.

The int8 suites landed on the bf16-tuned geometry (sub=64, block=128,
cpg=4, gd=4). The int8 MXU runs 2x bf16, so the bm pass shrinks and the
selection/danger stages dominate more; this sweep measures (a) the int8
bm-pass floor vs bf16, and (b) whether wider units (sub=128 halves both
[R/sub, T] refine-source scans) or tighter danger capacity move the tile.
All cells run interleaved in ONE process (cross-process relay drift is
+-5-15%); int8 scoring is bitwise identical across kernels, so every cell
must produce identical outputs — checked.

Usage: python scripts/proto_int8_geo.py [reps=16] [rounds=6]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops.quantize import quantize_unit
from better_search_rag_rust_tpu.ops.topk import rescore_topk
from better_search_rag_rust_tpu.ops.topk_pallas import matmul_blockmax2_only

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
K, Q = 100, 512
R, VALID, D = 1_015_808, 1_000_000, 768


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    norm = raw.astype(jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    store8 = jax.jit(quantize_unit)(norm)
    store16 = norm.astype(jnp.bfloat16)
    del raw, norm
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
    q8 = store8[sel]
    q16 = store16[sel]
    _force(store8); _force(q8); _force(store16); _force(q16)
    base = jnp.int32(0)

    def mk(sub, cpg, gd, block=128):
        def fn(qq, sh):
            return rescore_topk(
                sh, qq, K, base, VALID, q_tile=512, use_pallas=True,
                sub_block=sub, block=block, cpg=cpg, argmax_fast=True,
                danger_units=gd,
            )
        return jax.jit(fn)

    def mk_bm(sub):
        def fn(qq, sh):
            return matmul_blockmax2_only(
                qq, sh, jnp.int32(VALID), sub=sub, block=128,
                emit_block=True, emit_argmax=True, emit_width=128,
            )
        return jax.jit(fn)

    cells = [
        ("i8_prod_s64", mk(64, 4, 4), q8, store8),
        ("i8_s128_gd8", mk(128, 4, 8), q8, store8),
        ("i8_s128b1k_gd8", mk(128, 4, 8, block=1024), q8, store8),
        ("i8_s128b1k_gd4", mk(128, 4, 4, block=1024), q8, store8),
        ("bf_prod_s64", mk(64, 4, 4), q16, store16),
        ("bf_s128b1k_gd8", mk(128, 4, 8, block=1024), q16, store16),
    ]
    refs = {}
    for nm, fn, qq, sh in cells:
        out = fn(qq, sh)
        tag = nm.split("_")[0]
        if True:
            v, i = (np.asarray(jax.device_get(out[0])),
                    np.asarray(jax.device_get(out[1])))
            if tag not in refs:
                refs[tag] = (v, i)
            else:
                same = (np.array_equal(refs[tag][0], v)
                        and np.array_equal(refs[tag][1], i))
                print(f"identical {tag}_prod vs {nm}: {same}", flush=True)
        print(f"{nm}: compiled", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    best = {n: 1e9 for n, *_ in cells}
    for rnd in range(ROUNDS):
        out = tiny(q8); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(q8)
        _force(out)
        sync = (time.perf_counter() - t0) / REPS
        for n, fn, qq, sh in cells:
            out = fn(qq, sh)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(qq, sh)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n}={best[n]*1e3:.2f}" for n, *_ in cells),
              flush=True)
    for n, *_ in cells:
        print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
