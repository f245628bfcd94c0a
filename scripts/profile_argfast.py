"""Cumulative stage profile of the argmax fast path (1M x 768 bench shape).

Times cumulative prefixes in ONE process (interleaved rounds, min), with a
tiny-op loop estimating the per-dispatch sync floor to subtract.

Usage: python scripts/profile_argfast.py
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
    gather_rescore, m2_sort_key, matmul_blockmax2_only,
)

R, D, block, cpg = 1_015_808, 768, 128, 8
sub = int(os.environ.get("SUB", "32"))
VALID = 1_000_000
k, t, GD = 100, 512, 8
nb = R // block
nsub = R // sub
kb = min(k, nb)
spb = block // sub
pool = kb * spb
ks = 104
int_max = jnp.iinfo(jnp.int32).max


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def main():
    shard = jax.random.normal(jax.random.PRNGKey(0), (R, D),
                              dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (t, D), dtype=jnp.bfloat16)
    _force(shard); _force(q)
    valid = jnp.int32(VALID)

    def bm_pass(qq, sh):
        return matmul_blockmax2_only(
            qq, sh, valid, sub=sub, block=block, emit_block=True,
            emit_argmax=True)

    def upto_select(qq, sh):
        bms_t, key_t, bm_t = bm_pass(qq, sh)
        bm = bm_t.T
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
        return bms_t, key_t, bids

    def upto_refine(qq, sh):
        bms_t, key_t, bids = upto_select(qq, sh)
        bms3 = bms_t.T.reshape(t, nb, spb)
        cand_bm = jnp.take_along_axis(
            bms3, bids[:, :, None], axis=1).reshape(t, pool)
        cand_uids = (
            bids[:, :, None] * spb
            + jnp.arange(spb, dtype=jnp.int32)[None, None, :]
        ).reshape(t, pool)
        vals, pos = T._fast_topk(cand_bm, ks)
        uids = jnp.take_along_axis(cand_uids, pos, axis=1)
        return key_t, bids, vals, pos, uids

    def upto_pool(qq, sh):
        key_t, bids, vals, pos, uids = upto_refine(qq, sh)
        key3 = key_t.T.reshape(t, nb, spb)
        cand_key = jnp.take_along_axis(
            key3, bids[:, :, None], axis=1).reshape(t, pool)
        key_sel = jnp.take_along_axis(cand_key, pos, axis=1)
        arg_sel = key_sel & 0xFFFF
        return vals, uids, arg_sel, key_sel

    def upto_danger(qq, sh):
        vals, uids, arg_sel, key_sel = upto_pool(qq, sh)
        w = jax.lax.dynamic_slice_in_dim(vals, k - 1, 1, axis=1)
        w_key = m2_sort_key(w)
        a_gids = jnp.where(vals > T.PAD_SIM, uids * sub + arg_sel, int_max)
        danger_count = jnp.sum((key_sel >= w_key).astype(jnp.int32), axis=1)
        cert = jnp.all(danger_count <= GD)
        _, dpos = jax.lax.top_k(key_sel, GD)
        d_uids = jnp.take_along_axis(uids, dpos, axis=1)
        d_args = jnp.take_along_axis(arg_sel, dpos, axis=1)
        dperm = jnp.argsort(d_uids, axis=1)
        d_uids_s = jnp.take_along_axis(d_uids, dperm, axis=1)
        d_args_s = jnp.take_along_axis(d_args, dperm, axis=1)
        return vals, a_gids, cert, d_uids_s, d_args_s

    def upto_gather(qq, sh):
        vals, a_gids, cert, d_uids_s, d_args_s = upto_danger(qq, sh)
        d_sims = gather_rescore(qq, sh, d_uids_s, unit=sub, cpg=GD)
        return vals, a_gids, cert, d_uids_s, d_args_s, d_sims

    def full_nocond(qq, sh):
        vals, a_gids, cert, d_uids_s, d_args_s, d_sims = upto_gather(qq, sh)
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
        c_vals = jnp.concatenate([vals, d_sims], axis=1)
        c_ids = jnp.concatenate([a_gids, d_ids], axis=1)
        neg, ids_sorted = jax.lax.sort((-(c_vals + 0.0), c_ids), num_keys=2)
        return -neg[:, :k], ids_sorted[:, :k]

    def full_pkg(qq, sh):
        return T.rescore_topk(sh, qq, k, jnp.int32(0), VALID, q_tile=t,
                              use_pallas=True, block=block, sub_block=sub,
                              cpg=cpg, argmax_fast=True)

    stages = [
        ("bm_pass(arg+m2)", jax.jit(bm_pass)),
        ("+hier_select", jax.jit(upto_select)),
        ("+refine", jax.jit(upto_refine)),
        ("+pool_gathers(arg,m2)", jax.jit(upto_pool)),
        ("+cert+danger_prep", jax.jit(upto_danger)),
        ("+danger_gather", jax.jit(upto_gather)),
        ("full (no cond)", jax.jit(full_nocond)),
        ("full rescore_topk(argmax)", jax.jit(full_pkg)),
    ]

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    for name, fn in stages:
        out = fn(q, shard)
        _force(out)
    best = {n: 1e9 for n, _ in stages}
    sync_best = 1e9
    for rnd in range(3):
        out = tiny(q); _force(out)
        t0 = time.perf_counter()
        for _ in range(16):
            out = tiny(q)
        _force(out)
        sync_best = min(sync_best, (time.perf_counter() - t0) / 16)
        for n, fn in stages:
            out = fn(q, shard)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(16):
                out = fn(q, shard)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / 16)
        print(f"round {rnd} sync={sync_best*1e3:.2f}: " + " | ".join(
            f"{n}: {best[n]*1e3:.2f}" for n, _ in stages), flush=True)
    print(f"\nsync floor/iter ~{sync_best*1e3:.2f} ms", flush=True)
    prev = 0.0
    for n, _ in stages:
        v = best[n] - sync_best
        print(f"{n:>28s}: {v*1e3:7.2f} ms  (+{(v-prev)*1e3:6.2f})",
              flush=True)
        prev = v


if __name__ == "__main__":
    main()
