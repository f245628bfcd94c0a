"""N-fit A/B of selection-tail REFORMULATIONS (int8, 1M x 768), one process.

proto_int8_tail2.py split the 1.83 ms tail into: group select 0.18, pool
bms gather 0.28, pool topk 0.59, key unit-gather 0.53, key tail 0.11,
danger gather + final sort 0.15. Cells here attack the two big items:

  ref    full production rescore_topk              (4.34 ms expected)
  pool   prod two-level pool stage                 (3.56 reference)
  s1     SINGLE-LEVEL selection: _fast_topk straight over bms_t.T
         [T, R/sub=15872] -> ks, no bmi emission, no group level, no
         pool gather (the containment proof per unit is the same as per
         group; ks >= k selected units by (max desc, idx asc) cover the
         top-k rows)
  s1full complete single-level argmax fast path incl. danger gather and
         final sort — output must EQUAL ref's (both exact, oracle ties)
  pt1    pool topk via plain lax.top_k (is approx_max_k the pool cost?)
  kb16   key gather from an int16 [R/sub, T] source (timing-only probe:
         does gather cost scale with source bytes?)
  ka8    m2 gather from int16 + arg gather from int8 sources (timing)

Usage: python scripts/proto_int8_tail3.py [n1=8] [n2=32] [rounds=5]
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
    bm2_emit_width, gather_rescore, m2_sort_key, matmul_blockmax2_only,
    pick_bm2_row_tile,
)

N1 = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N2 = int(sys.argv[2]) if len(sys.argv) > 2 else 32
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
K, Q = 100, 512
R, VALID, D = 1_015_808, 1_000_000, 768
SUB, BLOCK, GD, CPG_D = 64, 128, 4, 2
int_max = jnp.iinfo(jnp.int32).max
T = Q
NB = R // BLOCK
SPB = BLOCK // SUB
NU = R // SUB
SUP_W = 8
NG, GW = NB // SUP_W, SUP_W * SPB
KG = min(K, NG)
POOL = KG * GW
KS = 104


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


RT = pick_bm2_row_tile(R, D, T, SUB, BLOCK, 1, extra_outs=1)
EW = bm2_emit_width(R, RT, SUB, BLOCK)


def bm(qq, sh, emit_block=True):
    return matmul_blockmax2_only(
        qq, sh, jnp.int32(VALID), sub=SUB, block=BLOCK,
        emit_block=emit_block and bool(EW), emit_argmax=True,
        emit_width=EW or BLOCK,
    )


def pool_stage(qq, sh, topk=_fast_topk):
    bms_t, key_t, bmi_t = bm(qq, sh)
    upg = (GW * SUB) // (EW or BLOCK)
    gmax = jnp.max(bmi_t.T.reshape(T, NG, upg), axis=2)
    _, gids = _fast_topk(gmax, KG)
    gids = jnp.sort(gids, axis=1)
    bms3 = bms_t.T.reshape(T, NG, GW)
    cand_bm = jnp.take_along_axis(
        bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(T, POOL)
    vals, pos = topk(cand_bm, KS)
    g_of = jnp.take_along_axis(gids, pos // GW, axis=1,
                               mode="promise_in_bounds")
    uids = g_of * GW + pos % GW
    return vals, uids, key_t


def fast_finish(qq, sh, vals, uids, key_t):
    """The argmax fast path's key/danger/final stages (mirrors
    rescore_topk's production branch)."""
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

    def fast(_):
        d_sims = gather_rescore(qq, sh, d_uids_s, unit=SUB, cpg=CPG_D)
        d_rows = (
            d_uids_s[:, :, None] * SUB
            + jnp.arange(SUB, dtype=jnp.int32)[None, None, :]
        ).reshape(T, GD * SUB)
        is_arg = (
            jnp.arange(SUB, dtype=jnp.int32)[None, None, :]
            == d_args_s[:, :, None]
        ).reshape(T, GD * SUB)
        ok = (d_rows < VALID) & ~is_arg
        d_sims = jnp.where(ok, d_sims, PAD_SIM)
        d_ids = jnp.where(ok, d_rows, int_max)
        c_vals = jnp.concatenate([vals, d_sims], axis=1)
        c_ids = jnp.concatenate([a_gids, d_ids], axis=1)
        neg, ids_sorted = jax.lax.sort((-(c_vals + 0.0), c_ids), num_keys=2)
        return -neg[:, :K], ids_sorted[:, :K]

    def slow(_):
        uids_s = jnp.sort(uids, axis=1)
        cand_sims = gather_rescore(qq, sh, uids_s, unit=SUB, cpg=4)
        local_rows = (
            uids_s[:, :, None] * SUB
            + jnp.arange(SUB, dtype=jnp.int32)[None, None, :]
        ).reshape(T, KS * SUB)
        cand_sims = jnp.where(local_rows < VALID, cand_sims, PAD_SIM)
        cand_ids = jnp.where(local_rows < VALID, local_rows, int_max)
        neg, ids_sorted = jax.lax.sort(
            (-(cand_sims + 0.0), cand_ids), num_keys=2)
        return -neg[:, :K], ids_sorted[:, :K]

    return jax.lax.cond(cert, fast, slow, None)


def cell_ref(qq, sh):
    return rescore_topk(
        sh, qq, K, jnp.int32(0), VALID, q_tile=512, use_pallas=True,
        sub_block=SUB, block=BLOCK, cpg=4, argmax_fast=True, danger_units=GD,
    )


def cell_pool(qq, sh):
    v, u, _ = pool_stage(qq, sh)
    return v, u


def cell_s1(qq, sh):
    bms_t, key_t = bm(qq, sh, emit_block=False)
    vals, uids = _fast_topk(bms_t.T, KS)
    return vals, uids


def cell_s1full(qq, sh):
    bms_t, key_t = bm(qq, sh, emit_block=False)
    vals, uids = _fast_topk(bms_t.T, KS)
    return fast_finish(qq, sh, vals, uids, key_t)


def cell_pt1(qq, sh):
    v, u, _ = pool_stage(qq, sh, topk=jax.lax.top_k)
    return v, u


def make_kb16(src16):
    def cell(qq, sh):
        v, u, _ = pool_stage(qq, sh)
        ks16 = jnp.take_along_axis(src16.T, u, axis=1,
                                   mode="promise_in_bounds")
        return v, u, ks16
    return cell


def make_ka8(src16, src8):
    def cell(qq, sh):
        v, u, _ = pool_stage(qq, sh)
        m2s = jnp.take_along_axis(src16.T, u, axis=1,
                                  mode="promise_in_bounds")
        args = jnp.take_along_axis(src8.T, u, axis=1,
                                   mode="promise_in_bounds")
        return v, u, m2s, args
    return cell


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    norm = raw.astype(jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    store8 = jax.jit(quantize_unit)(norm)
    del raw, norm
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
    q8 = store8[sel]
    k0, k1 = jax.random.split(jax.random.PRNGKey(1))
    src16 = jax.random.randint(k0, (NU, T), -2**15, 2**15 - 1, jnp.int16)
    src8 = jax.random.randint(k1, (NU, T), 0, 64, jnp.int8)
    _force(store8); _force(q8); _force(src16); _force(src8)
    print(f"rt={RT} ew={EW}", flush=True)

    cells = [("ref", jax.jit(cell_ref)),
             ("pool", jax.jit(cell_pool)),
             ("s1", jax.jit(cell_s1)),
             ("s1full", jax.jit(cell_s1full)),
             ("pt1", jax.jit(cell_pt1)),
             ("kb16", jax.jit(make_kb16(src16))),
             ("ka8", jax.jit(make_ka8(src16, src8)))]
    for nm, fn in cells:
        _force(fn(q8, store8))
        print(f"{nm}: compiled", flush=True)

    rv, ri = (np.asarray(jax.device_get(x)) for x in cells[0][1](q8, store8))
    sv, si = (np.asarray(jax.device_get(x)) for x in cells[3][1](q8, store8))
    print(f"identical ref vs s1full: "
          f"{np.array_equal(rv, sv) and np.array_equal(ri, si)}", flush=True)

    def timed(fn, n):
        out = fn(q8, store8)
        _force(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(q8, store8)
        _force(out)
        return time.perf_counter() - t0

    fits = {n: [] for n, _ in cells}
    for rnd in range(ROUNDS):
        for nm, fn in cells:
            t1 = timed(fn, N1)
            t2 = timed(fn, N2)
            fits[nm].append((t2 - t1) / (N2 - N1))
        print(f"round {rnd} " +
              " ".join(f"{n}={fits[n][-1]*1e3:.2f}" for n, _ in cells),
              flush=True)
    print("medians: " + " ".join(
        f"{n}={np.median(fits[n])*1e3:.2f}ms" for n, _ in cells), flush=True)


if __name__ == "__main__":
    main()
