"""Measure the danger-count distribution of the argmax fast path at
1M x 768 for int8 vs bf16 stores (self-retrieval queries, bench data
distribution). Explains the int8 tile's overhead over its bm-pass floor:
cert = all(danger_count <= gd) is per-TILE, so the overflow probability
of the worst query in 512 decides how often the full gather runs.

Usage: python scripts/proto_int8_danger.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops.quantize import quantize_unit
from better_search_rag_rust_tpu.ops.topk import _fast_topk
from better_search_rag_rust_tpu.ops.topk_pallas import (
    m2_sort_key, matmul_blockmax2_only,
)

K, Q = 100, 512
R, VALID, D = 1_015_808, 1_000_000, 768
SUB, BLOCK = 64, 128


@jax.jit
def danger_counts(q_block, shard):
    bms_t, key_t, bmi_t = matmul_blockmax2_only(
        q_block, shard, jnp.int32(VALID), sub=SUB, block=BLOCK,
        emit_block=True, emit_argmax=True, emit_width=BLOCK,
    )
    t = q_block.shape[0]
    nb = R // BLOCK
    spb = BLOCK // SUB
    sup_w = 8
    ng, gw = nb // sup_w, sup_w * spb
    kg = min(K, ng)
    pool = kg * gw
    ks = min(max(K, 4), pool)
    bms3 = bms_t.T.reshape(t, ng, gw)
    upg = (gw * SUB) // BLOCK
    gmax = jnp.max(bmi_t.T.reshape(t, ng, upg), axis=2)
    _, gids = _fast_topk(gmax, kg)
    gids = jnp.sort(gids, axis=1)
    cand_bm = jnp.take_along_axis(
        bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(t, pool)
    vals, pos = _fast_topk(cand_bm, ks)
    g_of = jnp.take_along_axis(gids, pos // gw, axis=1,
                               mode="promise_in_bounds")
    uids = g_of * gw + pos % gw
    key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                  mode="promise_in_bounds")
    w = jax.lax.dynamic_slice_in_dim(vals, K - 1, 1, axis=1)
    w_key = m2_sort_key(w)
    count = jnp.sum((key_sel >= w_key).astype(jnp.int32), axis=1)
    # exact (unpacked-equivalent) test: recover the rounded-up m2 bucket
    # floor to show how much the 64Ki roundup alone inflates the count
    exact_m2_key = key_sel & ~jnp.int32(0xFFFF)  # bucket top (still >= exact)
    count_bucket = jnp.sum(
        (exact_m2_key >= w_key).astype(jnp.int32), axis=1)
    return count, count_bucket


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    norm = raw.astype(jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    store8 = jax.jit(quantize_unit)(norm)
    store16 = norm.astype(jnp.bfloat16)
    del raw, norm
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
    for name, sh, qq in (("int8", store8, store8[sel]),
                         ("bf16", store16, store16[sel])):
        c, cb = danger_counts(qq, sh)
        c = np.asarray(jax.device_get(c))
        cb = np.asarray(jax.device_get(cb))
        for lbl, arr in (("packed", c), ("bucket", cb)):
            hist = {g: int((arr > g).sum()) for g in (2, 4, 8, 16, 32)}
            print(f"{name} {lbl}: mean={arr.mean():.2f} max={arr.max()} "
                  f"P(q>gd) over 512q: {hist}", flush=True)


if __name__ == "__main__":
    main()
