"""Full argmax-candidates + bounded danger-gather chain (1M x 768) vs current.

Pipeline: bm2 pass emits (unit max, unit argmax, unit max2, block max) ->
two-level select to ks units -> A-candidates = (max, argmax gid) free ->
danger = top-gd selected units by max2, rows DMA-gathered and rescored,
argmax row masked -> exact two-key (value desc, gid asc) sort over
A + danger. Certificates: (a) every unit with max >= w_k is selected
(count equality over the full bms), (b) total units with max2 >= w_k <= gd.
Either failure falls back to the current full gather path (lax.cond).

Usage: python scripts/proto_argfast.py
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
from better_search_rag_rust_tpu.ops.topk_pallas import gather_rescore
from proto_argmax import bm2x  # the extended pass

R, D, sub, block, cpg = 1_000_000, 768, 16, 128, 8
k, t = 100, 512
GD = 8  # danger-unit capacity per query
rows_pad = 1_015_808
nb = rows_pad // block
nsub = rows_pad // sub
kb = min(k, nb)
spb = block // sub
pool = kb * spb
ks = min(T._round_up(k, cpg), pool - pool % cpg)
int_max = jnp.iinfo(jnp.int32).max


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def argfast(qq, sh, valid):
    bms_t, barg_t, bm2_t, bm_t = bm2x(qq, sh, valid, mode=2)
    bm = bm_t.T
    bms3 = bms_t.T.reshape(t, nb, spb)
    # --- two-level select (same as current) ---
    sup_w = 8
    nsup = nb // sup_w
    b8 = jnp.max(bm.reshape(t, nsup, sup_w), axis=2)
    ns = min(kb, nsup)
    _, sup = T._fast_topk(b8, ns)
    sup = jnp.sort(sup, axis=1)
    cand_bm0 = jnp.take_along_axis(
        bm.reshape(t, nsup, sup_w), sup[:, :, None], axis=1
    ).reshape(t, ns * sup_w)
    cand_bids = (
        sup[:, :, None] * sup_w
        + jnp.arange(sup_w, dtype=jnp.int32)[None, None, :]
    ).reshape(t, ns * sup_w)
    _, pos = T._fast_topk(cand_bm0, kb)
    bids = jnp.take_along_axis(cand_bids, pos, axis=1)
    bids = jnp.sort(bids, axis=1)
    # refine pool: sub maxima of selected blocks (uid-ascending layout)
    cand_bm = jnp.take_along_axis(
        bms3, bids[:, :, None], axis=1).reshape(t, pool)
    cand_uids = (
        bids[:, :, None] * spb
        + jnp.arange(spb, dtype=jnp.int32)[None, None, :]
    ).reshape(t, pool)
    vals, pos = T._fast_topk(cand_bm, ks)       # vals desc, ties pos asc
    uids_sel = jnp.take_along_axis(cand_uids, pos, axis=1)  # [t, ks]
    w = vals[:, k - 1:k]                        # [t, 1] the k-th unit max
    # --- A-candidates: argmax gid + exact max, barg/bm2 fused gathers ---
    barg3 = barg_t.T.reshape(t, nb, spb)
    bm23 = bm2_t.T.reshape(t, nb, spb)
    cand_arg = jnp.take_along_axis(
        barg3, bids[:, :, None], axis=1).reshape(t, pool)
    cand_m2 = jnp.take_along_axis(
        bm23, bids[:, :, None], axis=1).reshape(t, pool)
    arg_sel = jnp.take_along_axis(cand_arg, pos, axis=1)   # [t, ks]
    m2_sel = jnp.take_along_axis(cand_m2, pos, axis=1)     # [t, ks]
    a_gids = jnp.where(
        vals > T.PAD_SIM, uids_sel * sub + arg_sel, int_max)
    # --- certificate ---
    # The row-level containment proof already guarantees top-k rows live in
    # the ks SELECTED units; a top-k row that is not its unit's argmax
    # forces that unit's max2 >= w (the k-th selected unit max <= true
    # k-th score). So the ONLY condition needed is that all such units fit
    # the danger capacity — counted over the tiny [T, ks] array.
    danger_count = jnp.sum((m2_sel >= w).astype(jnp.int32), axis=1)  # [t]
    cert = jnp.all(danger_count <= GD)

    # --- danger gather: top-GD selected units by max2 ---
    _, dpos = jax.lax.top_k(m2_sel, GD)
    d_uids = jnp.take_along_axis(uids_sel, dpos, axis=1)    # [t, GD]
    d_args = jnp.take_along_axis(arg_sel, dpos, axis=1)     # [t, GD]
    d_uids_s = jnp.sort(d_uids, axis=1)
    perm = jnp.argsort(d_uids, axis=1)
    d_args_s = jnp.take_along_axis(d_args, perm, axis=1)

    def fast(_):
        d_sims = gather_rescore(qq, sh, d_uids_s, unit=sub, cpg=GD)
        # [t, GD*sub]; mask the argmax row (already an A-candidate) and
        # invalid rows
        d_rows = (
            d_uids_s[:, :, None] * sub
            + jnp.arange(sub, dtype=jnp.int32)[None, None, :]
        ).reshape(t, GD * sub)
        is_arg = (
            jnp.arange(sub, dtype=jnp.int32)[None, None, :]
            == d_args_s[:, :, None]
        ).reshape(t, GD * sub)
        ok = (d_rows < valid) & ~is_arg
        d_sims = jnp.where(ok, d_sims, T.PAD_SIM)
        d_ids = jnp.where(ok, d_rows, int_max)
        # exact (value desc, gid asc) over A + danger via two-key sort
        c_vals = jnp.concatenate([vals, d_sims], axis=1)
        c_ids = jnp.concatenate([a_gids, d_ids], axis=1)
        neg, ids_sorted = jax.lax.sort((-c_vals, c_ids), num_keys=2)
        return -neg[:, :k], ids_sorted[:, :k]

    def slow(_):
        uids_srt = jnp.sort(uids_sel, axis=1)
        cand_sims = gather_rescore(qq, sh, uids_srt, unit=sub, cpg=cpg)
        local_rows = (
            uids_srt[:, :, None] * sub
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
        top_vals, p = T._fast_topk(cand_sims, k)
        return top_vals, jnp.take_along_axis(cand_ids, p, axis=1)

    return jax.lax.cond(cert, fast, slow, None), cert


def main():
    shard = jax.random.normal(jax.random.PRNGKey(0), (rows_pad, D),
                              dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (t, D), dtype=jnp.bfloat16)
    _force(shard); _force(q)
    valid = jnp.int32(R)

    new_fn = jax.jit(lambda qq, sh: argfast(qq, sh, valid))
    cur_fn = jax.jit(lambda qq, sh: T.rescore_topk(
        sh, qq, k, jnp.int32(0), R, q_tile=t, use_pallas=True,
        block=block, sub_block=sub, cpg=cpg))

    (vals_n, ids_n), cert = new_fn(q, shard)
    vals_c, ids_c = cur_fn(q, shard)
    print("cert taken:", bool(cert), flush=True)
    print("ids match:", bool(jnp.all(ids_n == ids_c)),
          "vals match:", bool(jnp.all(vals_n == vals_c)), flush=True)
    if not bool(jnp.all(ids_n == ids_c)):
        bad = np.argwhere(np.asarray(ids_n != ids_c))
        print("first mismatches:", bad[:5], flush=True)
        for qq_, kk_ in bad[:5]:
            print(f"  q={qq_} k={kk_} new=({np.asarray(ids_n)[qq_,kk_]},"
                  f"{np.asarray(vals_n)[qq_,kk_]:.6f}) cur="
                  f"({np.asarray(ids_c)[qq_,kk_]},"
                  f"{np.asarray(vals_c)[qq_,kk_]:.6f})", flush=True)

    fns = [("current", cur_fn), ("argfast", new_fn)]
    ITERS, ROUNDS = 16, 3
    best = {n: float("inf") for n, _ in fns}
    for rnd in range(ROUNDS):
        for n, fn in fns:
            out = fn(q, shard)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(q, shard)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / ITERS)
        print(f"round {rnd}: " + " | ".join(
            f"{n}: {best[n]*1e3:.2f}" for n, _ in fns), flush=True)


if __name__ == "__main__":
    main()
