"""N-fit A/B, round 2 of tail reformulations (int8, 1M x 768).

tail3 ruled out single-level selection, byte-shrunk key sources, and
showed gather cost is SCAN-POSITION-bound (~0.5 ms per [R/sub=15872, T]
source, any dtype, any index count). Cells here:

  ref     production rescore_topk                      (4.34 expected)
  bm      bm pass, prod emissions (argmax+block)       (2.51 expected)
  bmno    bm pass WITHOUT argmax emission — is the packed-key VPU work
          visible at int8 speed (it hid under the 2x-slower bf16 dot)?
  k8full  full fast path, key gather CHAINED: [NU,T] viewed [NU/8, 8, T],
          gather uids//8 over 1984 positions then select uids%8 within —
          swaps the 15872-position scan for a 1984-position one
  k64full same, split 64 (248 outer positions)
  p95full full fast path, pool topk via approx_max_k(recall=0.95) + the
          _fast_topk certificate (exact top_k fallback on any miss) —
          recall<1 gets a REAL PartialReduce (at 1.0 the reduction
          degenerates to input size, which is why it matched top_k)
  allfull k8 + p95 together

Variant outputs must EQUAL ref's (exactness is certificate-guarded).

Usage: python scripts/proto_int8_tail4.py [n1=8] [n2=32] [rounds=5]
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


def bm(qq, sh, emit_argmax=True):
    return matmul_blockmax2_only(
        qq, sh, jnp.int32(VALID), sub=SUB, block=BLOCK,
        emit_block=bool(EW), emit_argmax=emit_argmax, emit_width=EW or BLOCK,
    )


def topk_p95(x, kk):
    """_fast_topk with a real (recall .95) PartialReduce; same certificate,
    same exact-top_k fallback, so the result is still exact."""
    n = x.shape[1]
    kp = min(n, max(kk + 24, 128))
    av, ap = jax.lax.approx_max_k(x, kp, recall_target=0.95)
    w = jax.lax.dynamic_slice_in_dim(av, kk - 1, 1, axis=1)
    row_count = jnp.sum((x >= w).astype(jnp.int32), axis=1)
    cand_count = jnp.sum((av >= w).astype(jnp.int32), axis=1)
    cert = jnp.all(row_count == cand_count)

    def fast(_):
        neg, ids = jax.lax.sort((-(av + 0.0), ap), num_keys=2)
        return -neg[:, :kk], ids[:, :kk]

    def exact(_):
        vals, ids = jax.lax.top_k(x, kk)
        return vals, ids

    return jax.lax.cond(cert, fast, exact, None)


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


def key_gather_flat(key_t, uids):
    return jnp.take_along_axis(key_t.T, uids, axis=1,
                               mode="promise_in_bounds")


def make_key_gather_chain(split):
    def gather(key_t, uids):
        key3 = key_t.reshape(NU // split, split, T)
        outer = jnp.take_along_axis(
            key3.transpose(2, 0, 1), (uids // split)[:, :, None], axis=1,
            mode="promise_in_bounds",
        )                                                  # [T, ks, split]
        return jnp.take_along_axis(
            outer, (uids % split)[:, :, None], axis=2,
            mode="promise_in_bounds",
        )[:, :, 0]
    return gather


def fast_finish(qq, sh, vals, uids, key_t, key_gather):
    key_sel = key_gather(key_t, uids)
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


def cell_bm(qq, sh):
    return bm(qq, sh)


def cell_bmno(qq, sh):
    return bm(qq, sh, emit_argmax=False)


def make_full(topk, key_gather):
    def cell(qq, sh):
        vals, uids, key_t = pool_stage(qq, sh, topk=topk)
        return fast_finish(qq, sh, vals, uids, key_t, key_gather)
    return cell


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    norm = raw.astype(jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    store8 = jax.jit(quantize_unit)(norm)
    del raw, norm
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
    q8 = store8[sel]
    _force(store8); _force(q8)
    print(f"rt={RT} ew={EW}", flush=True)

    cells = [("ref", jax.jit(cell_ref)),
             ("bm", jax.jit(cell_bm)),
             ("bmno", jax.jit(cell_bmno)),
             ("k8full", jax.jit(make_full(_fast_topk,
                                          make_key_gather_chain(8)))),
             ("k64full", jax.jit(make_full(_fast_topk,
                                           make_key_gather_chain(64)))),
             ("p95full", jax.jit(make_full(topk_p95, key_gather_flat))),
             ("allfull", jax.jit(make_full(topk_p95,
                                           make_key_gather_chain(8))))]
    for nm, fn in cells:
        _force(fn(q8, store8))
        print(f"{nm}: compiled", flush=True)

    rv, ri = (np.asarray(jax.device_get(x)) for x in cells[0][1](q8, store8))
    for nm in ("k8full", "k64full", "p95full", "allfull"):
        gv, gi = (np.asarray(jax.device_get(x))
                  for x in dict(cells)[nm](q8, store8))
        print(f"identical ref vs {nm}: "
              f"{np.array_equal(rv, gv) and np.array_equal(ri, gi)}",
              flush=True)

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
