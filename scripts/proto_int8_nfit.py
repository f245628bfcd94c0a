"""N-fit stage decomposition of the int8 argmax fast path at 1M x 768.

The earlier stage profile (proto_int8_stages.py) subtracted a PER-ROUND
sync estimate and took min over rounds — sync's ~0.8 ms round-to-round
spread biases every absolute number down by up to that much (it produced
an impossible 1.43 ms int8 bm pass, above the 394 TOPS MXU peak). This
harness removes the fixed dispatch cost EXACTLY by timing each cell at
two rep counts and fitting the slope: t_op = (T(N2) - T(N1)) / (N2 - N1)
(CLAUDE.md relay discipline). Cells interleave in one process; report
per-round slopes plus the median.

Stages (cumulative, matching rescore_topk's production composition at
sub=64/block=128/cpg_d=2/gd=4 incl. the fused coarse emit width):
bm pass -> +group select -> +pool refine -> +key/danger select ->
full rescore_topk (adds the danger gather_rescore + final sort).

Usage: python scripts/proto_int8_nfit.py [n1=8] [n2=32] [rounds=5]
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
    bm2_emit_width, m2_sort_key, matmul_blockmax2_only, pick_bm2_row_tile,
)

N1 = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N2 = int(sys.argv[2]) if len(sys.argv) > 2 else 32
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
K, Q = 100, 512
R, VALID, D = 1_015_808, 1_000_000, 768
SUB, BLOCK, GD, CPG_D = 64, 128, 4, 2
int_max = jnp.iinfo(jnp.int32).max


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def build():
    t = Q
    nb = R // BLOCK
    spb = BLOCK // SUB
    sup_w = 8
    ng, gw = nb // sup_w, sup_w * spb
    kg = min(K, ng)
    pool = kg * gw
    ks = 104
    itemsize = 1
    rt = pick_bm2_row_tile(R, D, t, SUB, BLOCK, itemsize, extra_outs=1)
    ew = bm2_emit_width(R, rt, SUB, BLOCK)
    print(f"prod tile: rt={rt} ew={ew} ng={ng} gw={gw} pool={pool} ks={ks}",
          flush=True)

    def bm(qq, sh):
        return matmul_blockmax2_only(
            qq, sh, jnp.int32(VALID), sub=SUB, block=BLOCK,
            emit_block=bool(ew), emit_argmax=True, emit_width=ew or BLOCK,
        )

    def gsel_parts(qq, sh):
        outs = bm(qq, sh)
        bms_t, key_t, bmi_t = outs[0], outs[1], outs[-1]
        upg = (gw * SUB) // (ew or BLOCK)
        gmax = jnp.max(bmi_t.T.reshape(t, ng, upg), axis=2)
        _, gids = _fast_topk(gmax, kg)
        return jnp.sort(gids, axis=1), bms_t, key_t

    def gsel(qq, sh):
        gids, _, _ = gsel_parts(qq, sh)
        return gids

    def poolr_parts(qq, sh):
        gids, bms_t, key_t = gsel_parts(qq, sh)
        bms3 = bms_t.T.reshape(t, ng, gw)
        cand_bm = jnp.take_along_axis(
            bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
        ).reshape(t, pool)
        vals, pos = _fast_topk(cand_bm, ks)
        g_of = jnp.take_along_axis(gids, pos // gw, axis=1,
                                   mode="promise_in_bounds")
        uids = g_of * gw + pos % gw
        return vals, uids, key_t

    def poolr(qq, sh):
        vals, uids, _ = poolr_parts(qq, sh)
        return vals, uids

    def keyd(qq, sh):
        vals, uids, key_t = poolr_parts(qq, sh)
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
        return (vals, a_gids, cert,
                jnp.take_along_axis(d_uids, dperm, axis=1),
                jnp.take_along_axis(d_args, dperm, axis=1))

    def full(qq, sh):
        return rescore_topk(
            sh, qq, K, jnp.int32(0), VALID, q_tile=512, use_pallas=True,
            sub_block=SUB, block=BLOCK, cpg=4, argmax_fast=True,
            danger_units=GD,
        )

    return [("bm", jax.jit(bm)),
            ("gsel", jax.jit(gsel)),
            ("pool", jax.jit(poolr)),
            ("key", jax.jit(keyd)),
            ("full", jax.jit(full))]


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    norm = raw.astype(jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    store8 = jax.jit(quantize_unit)(norm)
    del raw, norm
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
    q8 = store8[sel]
    _force(store8); _force(q8)

    cells = build()
    for nm, fn in cells:
        _force(fn(q8, store8))
        print(f"{nm}: compiled", flush=True)

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
    meds = {n: float(np.median(v)) for n, v in fits.items()}
    names = [n for n, _ in cells]
    for a, b in zip(names, names[1:]):
        print(f"delta {b}-{a}: {(meds[b]-meds[a])*1e3:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
