"""Interleaved A/B of the SPLIT argmax emission (int8 args + group-coarse
danger keys) vs the packed single-key emission, full rescore_topk op at
1M x 768, both dtypes. Split removes the [T, R/sub] int32 packed-key
rescan (~0.5-0.7 ms/tile) in exchange for an int8 take (8 MB source) and
a [T, ng]-sized coarse take.

Usage: python scripts/proto_r3_split.py [reps=16] [rounds=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops import topk as topk_mod
from better_search_rag_rust_tpu.ops import topk_pallas
from better_search_rag_rust_tpu.ops.quantize import quantize_unit

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K, Q = 100, 512
R, VALID, D = 1_015_808, 1_000_000, 768


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def make(split_enabled: bool):
    real = topk_pallas.argmax_split_width

    def fn(qq, sh):
        return topk_mod.rescore_topk(
            sh, qq, K, jnp.int32(0), VALID, q_tile=512, use_pallas=True,
            sub_block=64, block=128, cpg=4, argmax_fast=True,
            danger_units=4,
        )

    if split_enabled:
        return jax.jit(fn)

    def packed(qq, sh):
        topk_pallas.argmax_split_width = lambda *a: 0
        try:
            return fn(qq, sh)
        finally:
            topk_pallas.argmax_split_width = real

    return jax.jit(packed)


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    norm = raw.astype(jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    store8 = jax.jit(quantize_unit)(norm)
    store16 = norm.astype(jnp.bfloat16)
    del raw, norm
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)

    cells = []
    for tag, sh in (("i8", store8), ("bf16", store16)):
        qq = sh[sel]
        for mode, enabled in (("split", True), ("packed", False)):
            cells.append((f"{tag}_{mode}", make(enabled), qq, sh))

    outs = {}
    for nm, fn, qq, sh in cells:
        out = fn(qq, sh)
        _force(out)
        outs[nm] = np.asarray(jax.device_get(out[1]))
        print(f"{nm}: compiled", flush=True)
    for tag in ("i8", "bf16"):
        same = np.array_equal(outs[f"{tag}_split"], outs[f"{tag}_packed"])
        print(f"{tag}: split == packed ids: {same}", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    best = {n: 1e9 for n, *_ in cells}
    for rnd in range(ROUNDS):
        qq0 = cells[0][2]
        out = tiny(qq0); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(qq0)
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
