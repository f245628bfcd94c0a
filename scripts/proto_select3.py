"""Transposed-layout select+refine chain + finalize/cpg variants (1M x 768).

The bm2 pass emits bms_t [NSUB, T] / bm_t [NB, T]. The current pipeline
transposes both to query-major before selection; the transposes are partly
fused but still cost. Variant: keep the store-major layout and gather the
SMALL candidate sets with take_along_axis(axis=0) (out[i, j] =
src[ids[i, j], j]), transposing only [O(k), T] intermediates.

Usage: python scripts/proto_select3.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops import topk as T
from better_search_rag_rust_tpu.ops.topk_pallas import (
    gather_rescore, matmul_blockmax2_only,
)

R, D, sub, block = 1_000_000, 768, 16, 128
k, t = 100, 512
rows_pad = T._round_up(R, max(1024, block))
nb = rows_pad // block
nsub = rows_pad // sub
kb = min(k, nb)
spb = block // sub


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def raw_time(fn, *args, iters):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def main():
    shard = jax.random.normal(jax.random.PRNGKey(0), (rows_pad, D),
                              dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (t, D), dtype=jnp.bfloat16)
    _force(shard); _force(q)
    valid = jnp.int32(R)

    bm_fn = jax.jit(lambda qq, sh: matmul_blockmax2_only(
        qq, sh, valid, sub=sub, block=block, emit_block=True))
    bms_t, bm_t = bm_fn(q, shard)
    bms_t = jax.block_until_ready(bms_t)
    bm_t = jax.block_until_ready(bm_t)

    t6 = raw_time(bm_fn, q, shard, iters=6)
    t24 = raw_time(bm_fn, q, shard, iters=24)
    C = (t6 - t24) / (1 / 6 - 1 / 24)
    print(f"calib C={C*1e3:.1f} ms; bm={(t24 - C/24)*1e3:.2f} ms", flush=True)

    def timeit(name, fn, *args, iters=16):
        tt = raw_time(fn, *args, iters=iters) - C / iters
        print(f"{name:>44s}: {tt*1e3:8.3f} ms", flush=True)
        return tt

    int_max = jnp.iinfo(jnp.int32).max

    # ---- current (query-major) select+refine, composed ----
    def cur_select_refine(bms_tx, bm_tx, ks):
        bm = bm_tx.T
        bms3 = bms_tx.T.reshape(t, nb, spb)
        sup_w = 8
        nsup = nb // sup_w
        b8 = jnp.max(bm.reshape(t, nsup, sup_w), axis=2)
        ns = min(kb, nsup)
        _, sup = T._fast_topk(b8, ns)
        sup = jnp.sort(sup, axis=1)
        cand_bm = jnp.take_along_axis(
            bm.reshape(t, nsup, sup_w), sup[:, :, None], axis=1
        ).reshape(t, ns * sup_w)
        cand_bids = (
            sup[:, :, None] * sup_w
            + jnp.arange(sup_w, dtype=jnp.int32)[None, None, :]
        ).reshape(t, ns * sup_w)
        _, pos = T._fast_topk(cand_bm, kb)
        bids = jnp.take_along_axis(cand_bids, pos, axis=1)
        bids = jnp.sort(bids, axis=1)
        cand_bms = jnp.take_along_axis(
            bms3, bids[:, :, None], axis=1).reshape(t, kb * spb)
        cand_uids = (
            bids[:, :, None] * spb
            + jnp.arange(spb, dtype=jnp.int32)[None, None, :]
        ).reshape(t, kb * spb)
        _, pos = T._fast_topk(cand_bms, ks)
        uids = jnp.take_along_axis(cand_uids, pos, axis=1)
        return jnp.sort(uids, axis=1)

    # ---- transposed (store-major) select+refine ----
    def tr_select_refine(bms_tx, bm_tx, ks):
        sup_w = 8
        nsup = nb // sup_w
        # superblock maxima, reduced on the sublane axis (no transpose)
        b8_t = jnp.max(bm_tx.reshape(nsup, sup_w, t), axis=1)  # [NSUP, T]
        b8 = b8_t.T                                            # [T, NSUP] small
        ns = min(kb, nsup)
        _, sup = T._fast_topk(b8, ns)
        sup = jnp.sort(sup, axis=1)                            # [T, ns]
        # gather the selected superblocks' block maxima from bm_t directly:
        # out[i, j] = bm_t[ids_t[i, j], j]
        bids8 = (
            sup[:, :, None] * sup_w
            + jnp.arange(sup_w, dtype=jnp.int32)[None, None, :]
        ).reshape(t, ns * sup_w)                               # [T, ns*8]
        cand_bm_t = jnp.take_along_axis(bm_tx, bids8.T, axis=0)  # [ns*8, T]
        _, pos = T._fast_topk(cand_bm_t.T, kb)
        bids = jnp.take_along_axis(bids8, pos, axis=1)
        bids = jnp.sort(bids, axis=1)                          # [T, kb]
        # refine: selected blocks' sub maxima from bms_t directly
        uidx = (
            bids[:, :, None] * spb
            + jnp.arange(spb, dtype=jnp.int32)[None, None, :]
        ).reshape(t, kb * spb)                                 # [T, kb*spb]
        cand_bms_t = jnp.take_along_axis(bms_tx, uidx.T, axis=0)  # [kb*spb, T]
        _, pos = T._fast_topk(cand_bms_t.T, ks)
        uids = jnp.take_along_axis(uidx, pos, axis=1)
        return jnp.sort(uids, axis=1)

    for ks in (112,):
        timeit("current select+refine (composed)",
               jax.jit(lambda a, b: cur_select_refine(a, b, ks)), bms_t, bm_t)
        timeit("transposed select+refine",
               jax.jit(lambda a, b: tr_select_refine(a, b, ks)), bms_t, bm_t)

    uids16 = jax.block_until_ready(
        jax.jit(lambda a, b: tr_select_refine(a, b, 112))(bms_t, bm_t))

    # exactness cross-check of the two refine flows
    uids_cur = jax.block_until_ready(
        jax.jit(lambda a, b: cur_select_refine(a, b, 112))(bms_t, bm_t))
    same = bool(jnp.all(uids16 == uids_cur))
    print(f"transposed == current uids: {same}", flush=True)

    # ---- gather cpg sweep at ks=112/120 ----
    g16 = timeit("gather cpg=16 ks=112",
                 jax.jit(lambda qq, sh, u: gather_rescore(
                     qq, sh, u, unit=sub, cpg=16)), q, shard, uids16)
    uids24 = jnp.concatenate([uids16, uids16[:, :8]], axis=1)
    uids24 = jax.block_until_ready(jnp.sort(uids24, axis=1))
    timeit("gather cpg=24 ks=120",
           jax.jit(lambda qq, sh, u: gather_rescore(
               qq, sh, u, unit=sub, cpg=24)), q, shard, uids24)

    cand = jax.block_until_ready(
        jax.jit(lambda qq, sh, u: gather_rescore(
            qq, sh, u, unit=sub, cpg=16))(q, shard, uids16))
    ks = 112

    # ---- finalize variants ----
    def fin_direct(cand_sims, uidsx):
        local_rows = (
            uidsx[:, :, None] * sub
            + jnp.arange(sub, dtype=jnp.int32)[None, None, :]
        ).reshape(t, ks * sub)
        cand_sims = jnp.where(local_rows < valid, cand_sims, T.PAD_SIM)
        cand_ids = jnp.where(local_rows < valid, local_rows, int_max)
        top_vals, pos = T._fast_topk(cand_sims, k)
        return top_vals, jnp.take_along_axis(cand_ids, pos, axis=1)

    def fin_reduce16(cand_sims, uidsx):
        local_rows = (
            uidsx[:, :, None] * sub
            + jnp.arange(sub, dtype=jnp.int32)[None, None, :]
        ).reshape(t, ks * sub)
        cand_sims = jnp.where(local_rows < valid, cand_sims, T.PAD_SIM)
        cand_ids = jnp.where(local_rows < valid, local_rows, int_max)
        c = cand_sims.shape[1]
        nr = c // 16
        s3 = cand_sims.reshape(t, nr, 16)
        rm = jnp.max(s3, axis=2)
        kr = min(k, nr)
        _, rpos = T._fast_topk(rm, kr)
        rpos = jnp.sort(rpos, axis=1)
        cand_sims = jnp.take_along_axis(
            s3, rpos[:, :, None], axis=1).reshape(t, kr * 16)
        cand_ids = jnp.take_along_axis(
            cand_ids.reshape(t, nr, 16), rpos[:, :, None], axis=1
        ).reshape(t, kr * 16)
        top_vals, pos = T._fast_topk(cand_sims, k)
        return top_vals, jnp.take_along_axis(cand_ids, pos, axis=1)

    timeit("finalize per-16 (current)", jax.jit(fin_reduce16), cand, uids16)
    timeit("finalize direct fast_topk", jax.jit(fin_direct), cand, uids16)

    a = jax.jit(fin_reduce16)(cand, uids16)
    b = jax.jit(fin_direct)(cand, uids16)
    print("finalize variants agree:",
          bool(jnp.all(a[0] == b[0]) & jnp.all(a[1] == b[1])), flush=True)

    # ---- full candidate pipeline: new vs old ----
    def full_new(qq, sh):
        bms_tx, bm_tx = matmul_blockmax2_only(
            qq, sh, valid, sub=sub, block=block, emit_block=True)
        uids = tr_select_refine(bms_tx, bm_tx, 112)
        cand_sims = gather_rescore(qq, sh, uids, unit=sub, cpg=16)
        return fin_direct(cand_sims, uids)

    timeit("FULL new chain", jax.jit(full_new), q, shard)
    timeit("FULL rescore_topk (current)", jax.jit(
        lambda qq, sh: T.rescore_topk(
            sh, qq, k, jnp.int32(0), R, q_tile=t, use_pallas=True,
            block=block, sub_block=sub, cpg=8)), q, shard)

    # exactness: new chain vs oracle on a slice
    vals_new, ids_new = jax.jit(full_new)(q, shard)
    vals_old, ids_old = jax.jit(lambda qq, sh: T.rescore_topk(
        sh, qq, k, jnp.int32(0), R, q_tile=t, use_pallas=True,
        block=block, sub_block=sub, cpg=8))(q, shard)
    print("new == old:",
          bool(jnp.all(ids_new == ids_old)),
          bool(jnp.all(vals_new == vals_old)), flush=True)


if __name__ == "__main__":
    main()
