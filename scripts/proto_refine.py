"""Micro-decomposition of the refine + key stages of the argmax path.

profile_group.py showed refine(+1.43 ms) and key gather(+1.01 ms) are the
bulk of the non-bm tile time at 1M x 768.  This splits each into its ops
(gather scan / fast_topk / takes) cumulatively, same protocol.

Usage: python scripts/proto_refine.py
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
    bm2_emit_width, m2_sort_key, matmul_blockmax2_only, pick_bm2_row_tile,
)

R, D, sub, block, cpg = 1_015_808, 768, 32, 128, 8
VALID = 1_000_000
k, t = 100, 512
itemsize = 2
nb = R // block
spb = block // sub
sup_w = 8
ng, gw = nb // sup_w, sup_w * spb
kg = min(k, ng)
pool = kg * gw
ks = 104
rt = pick_bm2_row_tile(R, D, t, sub, block, itemsize, extra_outs=1)
ew = bm2_emit_width(R, rt, sub, block)
print(f"ng={ng} gw={gw} pool={pool} ks={ks} rt={rt} ew={ew}", flush=True)


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

    def upto_select(qq, sh):
        bms_t, key_t, bmi_t = bm_pass(qq, sh)
        upg = (gw * sub) // ew
        gmax = jnp.max(bmi_t.T.reshape(t, ng, upg), axis=2)
        _, gids = T._fast_topk(gmax, kg)
        gids = jnp.sort(gids, axis=1)
        return bms_t, key_t, gids

    def upto_bmsgather(qq, sh):
        bms_t, key_t, gids = upto_select(qq, sh)
        bms3 = bms_t.T.reshape(t, ng, gw)
        cand_bm = jnp.take_along_axis(
            bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
        ).reshape(t, pool)
        return key_t, gids, cand_bm

    def upto_ftk(qq, sh):
        key_t, gids, cand_bm = upto_bmsgather(qq, sh)
        vals, pos = T._fast_topk(cand_bm, ks)
        return key_t, gids, vals, pos

    def upto_uids(qq, sh):
        key_t, gids, vals, pos = upto_ftk(qq, sh)
        cand_uids = (
            gids[:, :, None] * gw
            + jnp.arange(gw, dtype=jnp.int32)[None, None, :]
        ).reshape(t, pool)
        uids = jnp.take_along_axis(cand_uids, pos, axis=1)
        return key_t, gids, vals, pos, uids

    def upto_keygather(qq, sh):
        key_t, gids, vals, pos, uids = upto_uids(qq, sh)
        key3 = key_t.T.reshape(t, ng, gw)
        cand_key = jnp.take_along_axis(
            key3, gids[:, :, None], axis=1, mode="promise_in_bounds"
        ).reshape(t, pool)
        return vals, pos, uids, cand_key

    def upto_keysel(qq, sh):
        vals, pos, uids, cand_key = upto_keygather(qq, sh)
        key_sel = jnp.take_along_axis(cand_key, pos, axis=1)
        return vals, uids, key_sel

    stages = [
        ("bm_pass", jax.jit(bm_pass)),
        ("+select", jax.jit(upto_select)),
        ("+bms gather", jax.jit(upto_bmsgather)),
        ("+fast_topk(pool,ks)", jax.jit(upto_ftk)),
        ("+uids take", jax.jit(upto_uids)),
        ("+key gather", jax.jit(upto_keygather)),
        ("+key_sel take", jax.jit(upto_keysel)),
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
