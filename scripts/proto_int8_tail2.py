"""N-fit micro-decomposition of the int8 selection TAIL at 1M x 768, plus
reformulation variants — all interleaved in one process.

proto_int8_nfit.py pinned the tile at bm 2.51 / pool +0.95 / key +0.59 /
danger +0.15 ms. The pool/key sources are only 32.5 MB (0.1 ms at the
310 GB/s gather rate), so the cost must sit in the topk ops or in a
worse-than-expected gather lowering. Cells (all cumulative from the bm
pass, N-fit timing):

  gsel    prod group select                     (baseline)
  poolg   + bms pool gather ONLY                 -> gather cost
  pool    + pool topk (prod)                     -> topk cost
  poolf   pool but FLAT unit-index gather from bms_t.T [T, NU]
  pool4   pool at sup_w=4 (gw=8, pool=800)
  keyg    pool + key gather ONLY                 -> key-scan cost
  key     full key/danger stage (prod)
  keyp    key gather at GROUP level with the bms pool (key_sel by pos
          take from the [T, pool] key pool) — replaces the unit-level
          [T, R/sub] scan with a second group gather

Variant outputs are checked identical to prod (int8 scoring is bitwise
across formulations; gather/max are order-independent).

Usage: python scripts/proto_int8_tail2.py [n1=8] [n2=32] [rounds=5]
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
from better_search_rag_rust_tpu.ops.topk import PAD_SIM, _fast_topk
from better_search_rag_rust_tpu.ops.topk_pallas import (
    bm2_emit_width, m2_sort_key, matmul_blockmax2_only, pick_bm2_row_tile,
)

N1 = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N2 = int(sys.argv[2]) if len(sys.argv) > 2 else 32
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
K, Q = 100, 512
R, VALID, D = 1_015_808, 1_000_000, 768
SUB, BLOCK, GD = 64, 128, 4
int_max = jnp.iinfo(jnp.int32).max
T = Q
NB = R // BLOCK
SPB = BLOCK // SUB
NU = R // SUB


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


RT = pick_bm2_row_tile(R, D, T, SUB, BLOCK, 1, extra_outs=1)
EW = bm2_emit_width(R, RT, SUB, BLOCK)


def bm(qq, sh):
    return matmul_blockmax2_only(
        qq, sh, jnp.int32(VALID), sub=SUB, block=BLOCK,
        emit_block=bool(EW), emit_argmax=True, emit_width=EW or BLOCK,
    )


def geometry(sup_w):
    if NB >= 4 * sup_w * min(K, NB) and NB % sup_w == 0:
        ng, gw = NB // sup_w, sup_w * SPB
    else:
        ng, gw = NB, SPB
    kg = min(K, ng)
    pool = kg * gw
    ks = 104
    return ng, gw, kg, pool, ks


def gsel_parts(qq, sh, sup_w=8):
    ng, gw, kg, pool, ks = geometry(sup_w)
    outs = bm(qq, sh)
    bms_t, key_t, bmi_t = outs[0], outs[1], outs[-1]
    upg = (gw * SUB) // (EW or BLOCK)
    gmax = jnp.max(bmi_t.T.reshape(T, ng, upg), axis=2)
    _, gids = _fast_topk(gmax, kg)
    return jnp.sort(gids, axis=1), bms_t, key_t


def pool_gather(qq, sh, sup_w=8):
    ng, gw, kg, pool, ks = geometry(sup_w)
    gids, bms_t, key_t = gsel_parts(qq, sh, sup_w)
    bms3 = bms_t.T.reshape(T, ng, gw)
    cand_bm = jnp.take_along_axis(
        bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(T, pool)
    return cand_bm, gids, key_t


def pool_stage(qq, sh, sup_w=8):
    ng, gw, kg, pool, ks = geometry(sup_w)
    cand_bm, gids, key_t = pool_gather(qq, sh, sup_w)
    vals, pos = _fast_topk(cand_bm, ks)
    g_of = jnp.take_along_axis(gids, pos // gw, axis=1,
                               mode="promise_in_bounds")
    uids = g_of * gw + pos % gw
    return vals, uids, key_t


def pool_flat(qq, sh):
    """Pool gather by FLAT unit indices straight from bms_t.T [T, NU]."""
    ng, gw, kg, pool, ks = geometry(8)
    gids, bms_t, key_t = gsel_parts(qq, sh)
    uidx = (
        gids[:, :, None] * gw + jnp.arange(gw, dtype=jnp.int32)[None, None, :]
    ).reshape(T, pool)
    cand_bm = jnp.take_along_axis(
        bms_t.T, uidx, axis=1, mode="promise_in_bounds")
    vals, pos = _fast_topk(cand_bm, ks)
    uids = jnp.take_along_axis(uidx, pos, axis=1, mode="promise_in_bounds")
    return vals, uids, key_t


def key_tail(vals, uids, key_sel):
    ng, gw, kg, pool, ks = geometry(8)
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
    return (vals, a_gids, cert,
            jnp.take_along_axis(d_uids, dperm, axis=1),
            jnp.take_along_axis(d_args, dperm, axis=1))


def cell_gsel(qq, sh):
    return gsel_parts(qq, sh)[0]


def cell_poolg(qq, sh):
    return pool_gather(qq, sh)[0]


def cell_pool(qq, sh):
    v, u, _ = pool_stage(qq, sh)
    return v, u


def cell_poolf(qq, sh):
    v, u, _ = pool_flat(qq, sh)
    return v, u


def cell_pool4(qq, sh):
    v, u, _ = pool_stage(qq, sh, sup_w=4)
    return v, u


def cell_keyg(qq, sh):
    vals, uids, key_t = pool_stage(qq, sh)
    key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                  mode="promise_in_bounds")
    return vals, uids, key_sel


def cell_key(qq, sh):
    vals, uids, key_t = pool_stage(qq, sh)
    key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                  mode="promise_in_bounds")
    return key_tail(vals, uids, key_sel)


def cell_keyp(qq, sh):
    ng, gw, kg, pool, ks = geometry(8)
    gids, bms_t, key_t = gsel_parts(qq, sh)
    bms3 = bms_t.T.reshape(T, ng, gw)
    key3 = key_t.T.reshape(T, ng, gw)
    cand_bm = jnp.take_along_axis(
        bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(T, pool)
    key_pool = jnp.take_along_axis(
        key3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(T, pool)
    vals, pos = _fast_topk(cand_bm, ks)
    g_of = jnp.take_along_axis(gids, pos // gw, axis=1,
                               mode="promise_in_bounds")
    uids = g_of * gw + pos % gw
    key_sel = jnp.take_along_axis(key_pool, pos, axis=1,
                                  mode="promise_in_bounds")
    return key_tail(vals, uids, key_sel)


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

    cells = [("gsel", jax.jit(cell_gsel)),
             ("poolg", jax.jit(cell_poolg)),
             ("pool", jax.jit(cell_pool)),
             ("poolf", jax.jit(cell_poolf)),
             ("pool4", jax.jit(cell_pool4)),
             ("keyg", jax.jit(cell_keyg)),
             ("key", jax.jit(cell_key)),
             ("keyp", jax.jit(cell_keyp))]
    for nm, fn in cells:
        _force(fn(q8, store8))
        print(f"{nm}: compiled", flush=True)

    # correctness: variants == prod
    pv, pu = (np.asarray(jax.device_get(x)) for x in cells[2][1](q8, store8))
    for nm_v in ("poolf",):
        fv, fu = (np.asarray(jax.device_get(x))
                  for x in dict(cells)[nm_v](q8, store8))
        print(f"identical pool vs {nm_v}: "
              f"{np.array_equal(pv, fv) and np.array_equal(pu, fu)}",
              flush=True)
    kref = [np.asarray(jax.device_get(x)) for x in dict(cells)["key"](q8, store8)]
    kgot = [np.asarray(jax.device_get(x)) for x in dict(cells)["keyp"](q8, store8)]
    print(f"identical key vs keyp: "
          f"{all(np.array_equal(a, b) for a, b in zip(kref, kgot))}",
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
