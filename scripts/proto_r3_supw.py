"""Interleaved sweep of the superblock GROUP WIDTH (sup_w) for the
rescore selection stack — 1M x 768 (both dtypes, argmax path) and
10M x 256 int8 (full-gather path). sup_w sets the pool width
(pool = kg * sup_w * spb): narrower groups shrink the pool refine's
approx_max_k/certificate work; the [T, R/sub] source scans are
unchanged (source-bound).

Usage: python scripts/proto_r3_supw.py [reps=12] [rounds=4]
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
from better_search_rag_rust_tpu.ops.quantize import quantize_unit

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K, Q = 100, 512
R1, V1, D1 = 1_015_808, 1_000_000, 768


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R1, D1), jnp.bfloat16)
    norm = raw.astype(jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    store8 = jax.jit(quantize_unit)(norm)
    store16 = norm.astype(jnp.bfloat16)
    del raw, norm
    sel = jnp.linspace(0, V1 - 1, Q).astype(jnp.int32)

    cells = []
    for tag, sh in (("bf16", store16), ("i8", store8)):
        qq = sh[sel]
        for sw in (4, 8, 16):
            fn = jax.jit(lambda qq, sh, sw=sw: rescore_topk(
                sh, qq, K, jnp.int32(0), V1, q_tile=512, use_pallas=True,
                sub_block=64, block=128, cpg=4, argmax_fast=True,
                danger_units=4, sup_w=sw,
            ))
            cells.append((f"{tag}_sw{sw}", fn, qq, sh))

    outs = {}
    for nm, fn, qq, sh in cells:
        out = fn(qq, sh)
        _force(out)
        outs[nm] = np.asarray(jax.device_get(out[1]))
        print(f"{nm}: compiled", flush=True)
    for tag in ("bf16", "i8"):
        for sw in (4, 16):
            same = np.array_equal(outs[f"{tag}_sw{sw}"], outs[f"{tag}_sw8"])
            print(f"{tag} sw{sw} == sw8: {same}", flush=True)

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
