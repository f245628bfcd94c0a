"""Cumulative stage profile of the group-selection argmax path.

Mirrors the current rescore_topk pallas branch stage by stage at either
headline geometry. Same-round sync subtraction (drift-robust).

Usage: CFG=10m python scripts/profile_group.py   (or CFG=1m, default)
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
    bm2_emit_width, gather_rescore, m2_sort_key, matmul_blockmax2_only,
    pick_bm2_row_tile,
)

CFG = os.environ.get("CFG", "1m")
if CFG == "10m":
    R, D, sub, block, cpg = 10_485_760, 256, 128, 1024, 4
    VALID = 10_000_000
else:
    R, D, sub, block, cpg = 1_015_808, 768, 32, 128, 8
    VALID = 1_000_000
k, t = 100, 512
itemsize = 2
nb = R // block
nsub = R // sub
kb = min(k, nb)
spb = block // sub
sup_w = 8
if nb >= 4 * sup_w * kb and nb % sup_w == 0:
    ng, gw = nb // sup_w, sup_w * spb
else:
    ng, gw = nb, spb
kg = min(k, ng)
pool = kg * gw
ks = min(k + (-k) % cpg, pool - pool % cpg)
ks = max(ks, cpg)
cpg_d = max(1, 128 // sub) if sub < 128 else 4
gd = max(cpg_d, (min(8, ks) + (-min(8, ks)) % cpg_d))
int_max = jnp.iinfo(jnp.int32).max
rt = pick_bm2_row_tile(R, D, t, sub, block, itemsize, extra_outs=1)
ew = bm2_emit_width(R, rt, sub, block)
print(f"cfg={CFG} ng={ng} gw={gw} pool={pool} ks={ks} gd={gd} rt={rt} "
      f"ew={ew}", flush=True)


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
            qq, sh, valid, sub=sub, block=block, emit_block=bool(ew),
            emit_argmax=True, emit_width=ew or block)

    def upto_gmax(qq, sh):
        bms_t, key_t, bmi_t = bm_pass(qq, sh)
        upg = (gw * sub) // ew
        gmax = jnp.max(bmi_t.T.reshape(t, ng, upg), axis=2)
        return bms_t, key_t, gmax

    def upto_select(qq, sh):
        bms_t, key_t, gmax = upto_gmax(qq, sh)
        _, gids = T._fast_topk(gmax, kg)
        gids = jnp.sort(gids, axis=1)
        return bms_t, key_t, gids

    def upto_refine(qq, sh):
        bms_t, key_t, gids = upto_select(qq, sh)
        bms3 = bms_t.T.reshape(t, ng, gw)
        cand_bm = jnp.take_along_axis(
            bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
        ).reshape(t, pool)
        vals, pos = T._fast_topk(cand_bm, ks)
        g_of = jnp.take_along_axis(
            gids, pos // gw, axis=1, mode="promise_in_bounds")
        uids = g_of * gw + pos % gw
        return key_t, gids, vals, pos, uids

    def upto_key(qq, sh):
        key_t, gids, vals, pos, uids = upto_refine(qq, sh)
        key_sel = jnp.take_along_axis(
            key_t.T, uids, axis=1, mode="promise_in_bounds")
        return vals, uids, key_sel

    def upto_danger(qq, sh):
        vals, uids, key_sel = upto_key(qq, sh)
        arg_sel = key_sel & 0xFFFF
        w = jax.lax.dynamic_slice_in_dim(vals, k - 1, 1, axis=1)
        w_key = m2_sort_key(w)
        a_gids = jnp.where(vals > T.PAD_SIM, uids * sub + arg_sel, int_max)
        danger_count = jnp.sum((key_sel >= w_key).astype(jnp.int32), axis=1)
        cert = jnp.all(danger_count <= gd)
        _, dpos = jax.lax.top_k(key_sel, gd)
        d_uids = jnp.take_along_axis(uids, dpos, axis=1)
        d_args = jnp.take_along_axis(arg_sel, dpos, axis=1)
        dperm = jnp.argsort(d_uids, axis=1)
        d_uids_s = jnp.take_along_axis(d_uids, dperm, axis=1)
        d_args_s = jnp.take_along_axis(d_args, dperm, axis=1)
        return vals, a_gids, cert, d_uids_s, d_args_s

    def upto_gather(qq, sh):
        vals, a_gids, cert, d_uids_s, d_args_s = upto_danger(qq, sh)
        d_sims = gather_rescore(qq, sh, d_uids_s, unit=sub, cpg=cpg_d)
        return vals, a_gids, cert, d_uids_s, d_args_s, d_sims

    def full_pkg(qq, sh):
        return T.rescore_topk(sh, qq, k, jnp.int32(0), VALID, q_tile=t,
                              use_pallas=True, block=block, sub_block=sub,
                              cpg=cpg, argmax_fast=True)

    stages = [
        ("bm_pass", jax.jit(bm_pass)),
        ("+gmax", jax.jit(upto_gmax)),
        ("+select", jax.jit(upto_select)),
        ("+refine(bms gather)", jax.jit(upto_refine)),
        ("+key gather", jax.jit(upto_key)),
        ("+danger prep", jax.jit(upto_danger)),
        ("+danger DMA", jax.jit(upto_gather)),
        ("full rescore_topk", jax.jit(full_pkg)),
    ]
    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    for name, fn in stages:
        _force(fn(q, shard))
    best = {n: 1e9 for n, _ in stages}
    for rnd in range(4):
        out = tiny(q); _force(out)
        t0 = time.perf_counter()
        for _ in range(16):
            out = tiny(q)
        _force(out)
        sync = (time.perf_counter() - t0) / 16
        for n, fn in stages:
            out = fn(q, shard)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(16):
                out = fn(q, shard)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / 16 - sync)
        print(f"round {rnd} sync={sync*1e3:.2f}", flush=True)
    prev = 0.0
    for n, _ in stages:
        v = best[n]
        print(f"{n:>22s}: {v*1e3:7.2f} ms  (+{(v-prev)*1e3:6.2f})",
              flush=True)
        prev = v


if __name__ == "__main__":
    main()
