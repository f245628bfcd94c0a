"""Cumulative stage profile of the CURRENT argmax fast path (group
selection + direct key gather + danger capacity 4) at 1M x 768, int8 vs
bf16, interleaved in ONE process. Pins where the int8 tile's overhead over
its bm-pass floor exceeds bf16's.

Stages (cumulative): bm pass -> +group select -> +pool refine ->
+key/danger -> +danger gather (fast branch body) -> full rescore_topk.

Usage: python scripts/proto_int8_stages.py [reps=16] [rounds=5]
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
from better_search_rag_rust_tpu.ops.topk import PAD_SIM, _fast_topk, rescore_topk
from better_search_rag_rust_tpu.ops.topk_pallas import (
    gather_rescore, m2_sort_key, matmul_blockmax2_only,
)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
K, Q = 100, 512
R, VALID, D = 1_015_808, 1_000_000, 768
SUB, BLOCK, GD, CPG_D = 64, 128, 4, 2
int_max = jnp.iinfo(jnp.int32).max


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def build(dtype_tag):
    t = Q
    nb = R // BLOCK
    spb = BLOCK // SUB
    sup_w = 8
    ng, gw = nb // sup_w, sup_w * spb
    kg = min(K, ng)
    pool = kg * gw
    ks = 104

    def bm(qq, sh):
        return matmul_blockmax2_only(
            qq, sh, jnp.int32(VALID), sub=SUB, block=BLOCK,
            emit_block=True, emit_argmax=True, emit_width=BLOCK,
        )

    def gsel(qq, sh):
        bms_t, key_t, bmi_t = bm(qq, sh)
        upg = (gw * SUB) // BLOCK
        gmax = jnp.max(bmi_t.T.reshape(t, ng, upg), axis=2)
        _, gids = _fast_topk(gmax, kg)
        return jnp.sort(gids, axis=1), bms_t, key_t

    def poolr(qq, sh):
        gids, bms_t, key_t = gsel(qq, sh)
        bms3 = bms_t.T.reshape(t, ng, gw)
        cand_bm = jnp.take_along_axis(
            bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
        ).reshape(t, pool)
        vals, pos = _fast_topk(cand_bm, ks)
        g_of = jnp.take_along_axis(gids, pos // gw, axis=1,
                                   mode="promise_in_bounds")
        uids = g_of * gw + pos % gw
        return vals, uids, key_t

    def keyd(qq, sh):
        vals, uids, key_t = poolr(qq, sh)
        key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                      mode="promise_in_bounds")
        arg_sel = key_sel & 0x7F
        w = jax.lax.dynamic_slice_in_dim(vals, K - 1, 1, axis=1)
        w_key = m2_sort_key(w)
        a_gids = jnp.where(vals > PAD_SIM, uids * SUB + arg_sel, int_max)
        danger_count = jnp.sum((key_sel >= w_key).astype(jnp.int32), axis=1)
        cert = jnp.all(danger_count <= GD)
        _, dpos = jax.lax.top_k(key_sel, GD)
        d_uids = jnp.take_along_axis(uids, dpos, axis=1)
        d_args = jnp.take_along_axis(arg_sel, dpos, axis=1)
        dperm = jnp.argsort(d_uids, axis=1)
        d_uids_s = jnp.take_along_axis(d_uids, dperm, axis=1)
        d_args_s = jnp.take_along_axis(d_args, dperm, axis=1)
        return vals, a_gids, cert, d_uids_s, d_args_s

    def dgather(qq, sh):
        vals, a_gids, cert, d_uids_s, d_args_s = keyd(qq, sh)
        d_sims = gather_rescore(qq, sh, d_uids_s, unit=SUB, cpg=CPG_D)
        d_rows = (
            d_uids_s[:, :, None] * SUB
            + jnp.arange(SUB, dtype=jnp.int32)[None, None, :]
        ).reshape(t, GD * SUB)
        is_arg = (
            jnp.arange(SUB, dtype=jnp.int32)[None, None, :]
            == d_args_s[:, :, None]
        ).reshape(t, GD * SUB)
        ok = (d_rows < VALID) & ~is_arg
        d_sims = jnp.where(ok, d_sims, PAD_SIM)
        d_ids = jnp.where(ok, d_rows, int_max)
        c_vals = jnp.concatenate([vals, d_sims], axis=1)
        c_ids = jnp.concatenate([a_gids, d_ids], axis=1)
        neg, ids_sorted = jax.lax.sort((-(c_vals + 0.0), c_ids), num_keys=2)
        return -neg[:, :K], ids_sorted[:, :K]

    def full(qq, sh):
        return rescore_topk(
            sh, qq, K, jnp.int32(0), VALID, q_tile=512, use_pallas=True,
            sub_block=SUB, block=BLOCK, cpg=4, argmax_fast=True,
            danger_units=GD,
        )

    return [(f"{dtype_tag}_bm", jax.jit(bm)),
            (f"{dtype_tag}_gsel", jax.jit(gsel)),
            (f"{dtype_tag}_pool", jax.jit(poolr)),
            (f"{dtype_tag}_key", jax.jit(keyd)),
            (f"{dtype_tag}_dgat", jax.jit(dgather)),
            (f"{dtype_tag}_full", jax.jit(full))]


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    norm = raw.astype(jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    store8 = jax.jit(quantize_unit)(norm)
    store16 = norm.astype(jnp.bfloat16)
    del raw, norm
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
    data = {"i8": (store8[sel], store8), "bf16": (store16[sel], store16)}
    cells = []
    for tag, (qq, sh) in data.items():
        for nm, fn in build(tag):
            cells.append((nm, fn, qq, sh))
    for nm, fn, qq, sh in cells:
        _force(fn(qq, sh))
        print(f"{nm}: compiled", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    best = {n: 1e9 for n, *_ in cells}
    for rnd in range(ROUNDS):
        out = tiny(data["i8"][0]); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(data["i8"][0])
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
