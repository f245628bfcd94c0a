"""Calibrated stage breakdown of the rescore kernel path.

Times cumulative prefixes of the tile pipeline (bm pass -> block reduce ->
hier select -> sub refine -> DMA gather+rescore -> finalize) for a given
config, with the relay's fixed sync cost C fitted out via t(N) = t_op + C/N.

Usage: python scripts/profile_rescore.py [10m|1m]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops import topk as T
from better_search_rag_rust_tpu.ops.topk_pallas import (
    bm2_emits_block, gather_rescore, matmul_blockmax2_only,
    pick_bm2_row_tile,
)

PAD_SIM = T.PAD_SIM


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def raw_time(fn, *args, iters):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "10m"
    if cfg == "10m":
        R, D, sub, block, cpg = 10_000_000, 256, 128, 1024, 4
    else:
        R, D, sub, block, cpg = 1_000_000, 768, 16, 128, 8
    k, t = 100, int(sys.argv[2]) if len(sys.argv) > 2 else 512
    itemsize = 2
    rows_pad = T._round_up(R, max(1024, block))
    nb = rows_pad // block
    kb = min(k, nb)
    spb = block // sub
    pool = kb * spb
    ks = min(T._round_up(k, cpg), pool - pool % cpg)
    ks = max(ks, cpg)

    shard = jax.random.normal(jax.random.PRNGKey(0), (rows_pad, D),
                              dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (t, D), dtype=jnp.bfloat16)
    _force(shard); _force(q)
    rt = pick_bm2_row_tile(rows_pad, D, t, sub, block, itemsize)
    fused = bm2_emits_block(rows_pad, rt, block, t)
    print(f"cfg={cfg} rows_pad={rows_pad} nb={nb} rt={rt} fused={fused} "
          f"sub={sub} block={block} cpg={cpg} ks={ks}", flush=True)
    valid = jnp.int32(R)

    def bm_pass(qq, sh):
        if fused:
            bms_t, bm_t = matmul_blockmax2_only(
                qq, sh, valid, sub=sub, block=block, emit_block=True)
            return bms_t, bm_t.T
        bms_t = matmul_blockmax2_only(qq, sh, valid, sub=sub, block=block)
        return bms_t, None

    def upto_reduce(qq, sh):
        bms_t, bm = bm_pass(qq, sh)
        bms3 = bms_t.T.reshape(t, nb, spb)
        if bm is None:
            bm = jnp.max(bms3, axis=2)
        return bms3, bm

    def upto_select(qq, sh):
        bms3, bm = upto_reduce(qq, sh)
        # replicate select_blocks_hier inline (nested fn in rescore_topk)
        sup_w = 8
        if nb >= 2048 and nb % sup_w == 0:
            sm = jnp.max(bm.reshape(t, nb // sup_w, sup_w), axis=2)
            ns = min(kb, nb // sup_w)
            _, sup = jax.lax.top_k(sm, ns)
            cand_bm = jnp.take_along_axis(
                bm.reshape(t, nb // sup_w, sup_w), sup[:, :, None], axis=1
            ).reshape(t, ns * sup_w)
            cand_bids = (
                sup[:, :, None] * sup_w
                + jnp.arange(sup_w, dtype=jnp.int32)[None, None, :]
            ).reshape(t, ns * sup_w)
            _, pos = jax.lax.top_k(cand_bm, kb)
            bids = jnp.take_along_axis(cand_bids, pos, axis=1)
        else:
            bids = T._select_blocks(bm, kb)
        return bms3, jnp.sort(bids, axis=1)

    def upto_refine(qq, sh):
        bms3, bids = upto_select(qq, sh)
        cand_bm = jnp.take_along_axis(
            bms3, bids[:, :, None], axis=1).reshape(t, kb * spb)
        cand_uids = (
            bids[:, :, None] * spb
            + jnp.arange(spb, dtype=jnp.int32)[None, None, :]
        ).reshape(t, kb * spb)
        _, pos = jax.lax.top_k(cand_bm, ks)
        uids = jnp.take_along_axis(cand_uids, pos, axis=1)
        return jnp.sort(uids, axis=1)

    def upto_gather(qq, sh):
        uids = upto_refine(qq, sh)
        return gather_rescore(qq, sh, uids, unit=sub, cpg=cpg)

    def full(qq, sh):
        return T.rescore_topk(sh, qq, k, jnp.int32(0), R,
                              q_tile=t, use_pallas=True, block=block,
                              sub_block=sub, cpg=cpg)

    stages = [
        ("bm_pass", jax.jit(bm_pass)),
        ("+block_reduce", jax.jit(upto_reduce)),
        ("+hier_select", jax.jit(upto_select)),
        ("+sub_refine", jax.jit(upto_refine)),
        ("+dma_gather", jax.jit(upto_gather)),
        ("full rescore_topk", jax.jit(full)),
    ]

    # calibrate C on the first stage
    f0 = stages[0][1]
    t6 = raw_time(f0, q, shard, iters=6)
    t24 = raw_time(f0, q, shard, iters=24)
    C = (t6 - t24) / (1 / 6 - 1 / 24)
    print(f"calib: t6={t6*1e3:.2f} t24={t24*1e3:.2f} -> C={C*1e3:.1f} ms",
          flush=True)

    prev = 0.0
    for name, fn in stages:
        tt = raw_time(fn, q, shard, iters=16) - C / 16
        print(f"{name:>20s}: {tt*1e3:8.2f} ms  (+{(tt-prev)*1e3:6.2f})",
              flush=True)
        prev = tt


if __name__ == "__main__":
    main()
