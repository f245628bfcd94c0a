"""Anatomy + variants of the int8 LOW-DIM full-gather tile (VERDICT r4 #3:
search_10m_int8_mat256 at MFU 0.46 vs 0.70 for its bf16 sibling — where do
the ~6.6 ms of non-dot time go, and can any of it move?).

Cumulative stages at 10M x 256 int8 (production fullg geometry sub=128,
block=1024, cpg=4; MXU floor 2*512*10.16M*256 / 394T = 6.6 ms):

  bm    - matmul_blockmax2_only alone (integer bms + ew coarse emit)
  sel   - bm + group selection + pool refine -> uids (the full selection)
  gat   - sel + gather_rescore of all ks units + validity masking
  ref   - production rescore_topk (argmax_fast=False); ref - gat = finalize

Variants (ids must be bitwise identical to ref):

  hier  - pool refine via a per-8 max micro-level before approx_max_k
          (PartialReduce at 6400-wide is suspected to be the selection's
          cost; the af mat256 path shares this stage)
  c2/c8 - gather_rescore capacity-per-grid-step sweep (r3 measured c2 at
          the af geometry only)

Usage: python scripts/proto_r5_int8fullg.py [reps=8] [rounds=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops.topk import PAD_SIM, _fast_topk, rescore_topk
from better_search_rag_rust_tpu.ops.topk_pallas import (
    bm2_emit_width,
    gather_rescore,
    matmul_blockmax2_only,
    pick_bm2_row_tile,
)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K, Q = 100, 512
VALID, D = 10_000_000, 256
R = 10_158_080  # multiple of 2048 and 1024
SUB, BLOCK, CPG = 128, 1024, 4
SUP_W = 8
int_max = jnp.iinfo(jnp.int32).max


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def build_store():
    from better_search_rag_rust_tpu.ops.quantize import quantize_unit

    data = jax.jit(lambda: jnp.zeros((R, D), jnp.int8))()
    fill = 1_015_808

    @jax.jit
    def fill_chunk(buf, key, start):
        x = jax.random.normal(key, (fill, D), dtype=jnp.float32)
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        x = x / jnp.where(n == 0.0, 1.0, n)
        return jax.lax.dynamic_update_slice(buf, quantize_unit(x), (start, 0))

    key = jax.random.PRNGKey(0)
    for i in range(R // fill):
        key, sub = jax.random.split(key)
        data = fill_chunk(data, sub, jnp.int32(i * fill))
    _force(data)
    return data


# --- stage builders mirroring ops/topk.py tile_fn (fullg branch) -----------

nb = R // BLOCK                      # 9920 blocks
spb = BLOCK // SUB                   # 8 sub-units per block
ng, gw = nb // SUP_W, SUP_W * spb    # 1240 groups of 64 units
kg = min(K, ng)                      # 100
pool = kg * gw                       # 6400


def ks_for(cpg: int) -> int:         # 100 at cpg=4, 104 at cpg=8
    return max(K + (-K) % cpg, cpg)


ks = ks_for(CPG)


def bm_pass(qq, sh):
    rt = pick_bm2_row_tile(R, D, Q, SUB, BLOCK, 1, extra_outs=0)
    ew = bm2_emit_width(R, rt, SUB, BLOCK)
    outs = matmul_blockmax2_only(
        qq, sh, jnp.int32(VALID), interpret=False, sub=SUB, block=BLOCK,
        emit_block=bool(ew), emit_argmax=False, emit_width=ew or BLOCK,
    )
    if not ew:
        outs = (outs,)
    bms_t = outs[0]
    bmi_t = outs[-1] if ew else None
    return bms_t, bmi_t, (ew or BLOCK)


def select_units(bms_t, bmi_t, ew, ks=ks):
    t = Q
    bms3 = bms_t.T.reshape(t, ng, gw)
    if bmi_t is not None:
        upg = (gw * SUB) // ew
        gmax = jnp.max(bmi_t.T.reshape(t, ng, upg), axis=2)
    else:
        gmax = jnp.max(bms3, axis=2)
    _, gids = _fast_topk(gmax, kg)
    gids = jnp.sort(gids, axis=1)
    cand_bm = jnp.take_along_axis(
        bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(t, pool)
    vals, pos = _fast_topk(cand_bm, ks)
    g_of = jnp.take_along_axis(gids, pos // gw, axis=1,
                               mode="promise_in_bounds")
    uids = g_of * gw + pos % gw
    return uids


def select_units_hier(bms_t, bmi_t, ew, ks=ks):
    """Variant: micro-level per-8 reduce before the pool approx_max_k —
    [T, 6400] PartialReduce becomes [T, 800] + a 8x-narrower repair."""
    t = Q
    bms3 = bms_t.T.reshape(t, ng, gw)
    if bmi_t is not None:
        upg = (gw * SUB) // ew
        gmax = jnp.max(bmi_t.T.reshape(t, ng, upg), axis=2)
    else:
        gmax = jnp.max(bms3, axis=2)
    _, gids = _fast_topk(gmax, kg)
    gids = jnp.sort(gids, axis=1)
    cand_bm = jnp.take_along_axis(
        bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(t, pool)
    # micro-level: top-ks 8-wide ranges, then exact top-ks within them
    nr = pool // 8
    c3 = cand_bm.reshape(t, nr, 8)
    rm = jnp.max(c3, axis=2)
    kr = min(ks, nr)
    _, rpos = _fast_topk(rm, kr)
    rpos = jnp.sort(rpos, axis=1)
    sub_bm = jnp.take_along_axis(
        c3, rpos[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(t, kr * 8)
    vals, spos = _fast_topk(sub_bm, ks)
    pos = jnp.take_along_axis(rpos, spos // 8, axis=1,
                              mode="promise_in_bounds") * 8 + spos % 8
    g_of = jnp.take_along_axis(gids, pos // gw, axis=1,
                               mode="promise_in_bounds")
    uids = g_of * gw + pos % gw
    return uids


def full_fullg(qq, sh, sel_fn, cpg):
    ks = ks_for(cpg)
    bms_t, bmi_t, ew = bm_pass(qq, sh)
    uids = sel_fn(bms_t, bmi_t, ew, ks)
    t = Q
    uids_s = jnp.sort(uids, axis=1)
    cand_sims = gather_rescore(qq, sh, uids_s, unit=SUB, cpg=cpg,
                               interpret=False)
    local_rows = (
        uids_s[:, :, None] * SUB
        + jnp.arange(SUB, dtype=jnp.int32)[None, None, :]
    ).reshape(t, ks * SUB)
    cand_sims = jnp.where(local_rows < VALID, cand_sims, PAD_SIM)
    cand_ids = jnp.where(local_rows < VALID, local_rows, int_max)
    # finalize (mirror of tile_fn's): per-16 reduce + two fast_topk
    c = cand_sims.shape[1]
    nr = c // 16
    s3 = cand_sims.reshape(t, nr, 16)
    rm = jnp.max(s3, axis=2)
    kr = min(K, nr)
    _, rpos = _fast_topk(rm, kr)
    rpos = jnp.sort(rpos, axis=1)
    cand_sims = jnp.take_along_axis(
        s3, rpos[:, :, None], axis=1).reshape(t, kr * 16)
    cand_ids = jnp.take_along_axis(
        cand_ids.reshape(t, nr, 16), rpos[:, :, None], axis=1
    ).reshape(t, kr * 16)
    top_vals, pos2 = _fast_topk(cand_sims, K)
    return top_vals, jnp.take_along_axis(cand_ids, pos2, axis=1)


def main():
    store = build_store()
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
    queries = store[sel]
    _force(queries)

    cells = []

    def cell(name, fn):
        cells.append((name, jax.jit(fn)))

    # production reference
    cell("ref", lambda qq, sh: rescore_topk(
        sh, qq, K, jnp.int32(0), VALID, q_tile=512, use_pallas=True,
        block=1024, sub_block=128, cpg=4, argmax_fast=False))
    # cumulative stages (small outputs so readback is negligible)
    cell("bm", lambda qq, sh: bm_pass(qq, sh)[0][:1, :1])
    cell("sel", lambda qq, sh: select_units(*bm_pass(qq, sh))[:1, :1])

    def gat(qq, sh):
        bms_t, bmi_t, ew = bm_pass(qq, sh)
        uids = select_units(bms_t, bmi_t, ew)
        uids_s = jnp.sort(uids, axis=1)
        cs = gather_rescore(qq, sh, uids_s, unit=SUB, cpg=CPG,
                            interpret=False)
        return cs[:1, :1]

    cell("gat", gat)
    # variants (full pipelines; ids must match ref)
    cell("hier", lambda qq, sh: full_fullg(qq, sh, select_units_hier, CPG))
    cell("c2", lambda qq, sh: full_fullg(qq, sh, select_units, 2))
    cell("c8", lambda qq, sh: full_fullg(qq, sh, select_units, 8))

    outs = {}
    for nm, fn in cells:
        out = fn(queries, store)
        _force(out)
        if nm in ("ref", "hier", "c2", "c8"):
            outs[nm] = np.asarray(jax.device_get(out[1]))
        print(f"{nm}: compiled", flush=True)
    ref_ids = outs["ref"]
    for nm, ids in outs.items():
        tag = "ids==ref" if np.array_equal(ids, ref_ids) else "MISMATCH!"
        print(f"{nm}: {tag}", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1)
    best = {n: 1e9 for n, _ in cells}
    for rnd in range(ROUNDS):
        out = tiny(queries); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(queries)
        _force(out)
        sync = (time.perf_counter() - t0) / REPS
        for n, fn in cells:
            out = fn(queries, store)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(queries, store)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n}={best[n]*1e3:.2f}" for n, _ in cells), flush=True)
    print("---- best (ms/tile of 512 q): ----", flush=True)
    for n, _ in cells:
        print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)
    print(f"anatomy: bm={best['bm']*1e3:.2f} "
          f"+sel={(best['sel']-best['bm'])*1e3:.2f} "
          f"+gather={(best['gat']-best['sel'])*1e3:.2f} "
          f"+finalize={(best['ref']-best['gat'])*1e3:.2f}", flush=True)


if __name__ == "__main__":
    main()
