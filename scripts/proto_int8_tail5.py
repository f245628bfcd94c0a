"""N-fit A/B of 1M x 768 int8 tail redesigns (after proto_int8_nfit2
localized the cost: pool topk +0.58 ms, key transpose+take +0.54 ms).

Cells (cumulative where meaningful):
  pool    nfit2's pool stage (group gather + _fast_topk(1600->104))
  keytr   pool + materialized key_t.T               — isolates the transpose
  keyg    pool + key take at uids                   — transpose + scan
  key     production key stage (danger selects)     — baseline for poolu
  poolu   UNSORTED-candidate redesign of pool+key: approx_max_k(1600->128,
          recall 1.0) + certificate + 1-key sort for w only; ALL 128
          candidates become the selected units (uids from ap, no 2-key
          repair sort, no pos re-take); key take + danger selects as
          production. Exact by the same containment: cert proves every
          pool element >= w is a candidate, and downstream consumers are
          order-independent (the final two-key sort re-sorts).

Usage: python scripts/proto_int8_tail5.py [n1=8] [n2=32] [rounds=4]
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
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
K, Q = 100, 512
R, VALID, D = 1_015_808, 1_000_000, 768
SUB, BLOCK, GD = 64, 128, 4
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
    rt = pick_bm2_row_tile(R, D, t, SUB, BLOCK, 1, extra_outs=1)
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

    def poolg_parts(qq, sh):
        gids, bms_t, key_t = gsel_parts(qq, sh)
        bms3 = bms_t.T.reshape(t, ng, gw)
        cand_bm = jnp.take_along_axis(
            bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
        ).reshape(t, pool)
        return cand_bm, gids, key_t

    def pool_parts(qq, sh):
        cand_bm, gids, key_t = poolg_parts(qq, sh)
        vals, pos = _fast_topk(cand_bm, ks)
        g_of = jnp.take_along_axis(gids, pos // gw, axis=1,
                                   mode="promise_in_bounds")
        uids = g_of * gw + pos % gw
        return vals, uids, key_t

    def poolr(qq, sh):
        vals, uids, _ = pool_parts(qq, sh)
        return vals, uids

    def keytr(qq, sh):
        vals, uids, key_t = pool_parts(qq, sh)
        return vals, uids, key_t.T + 0

    def keyg(qq, sh):
        vals, uids, key_t = pool_parts(qq, sh)
        key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                      mode="promise_in_bounds")
        return vals, uids, key_sel

    def _danger(vals, uids, key_sel):
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

    def keyd(qq, sh):
        vals, uids, key_t = pool_parts(qq, sh)
        key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                      mode="promise_in_bounds")
        return _danger(vals, uids, key_sel)

    def keyh_parts(qq, sh):
        """Group-hop key gather: sel11's arithmetic uids KEPT, but the
        key take routed through the same contiguous-group gather the bms
        pool uses (cand_key at gids, then the pos take reads a 3.3 MB
        source) — today's scan isolation puts the group gather at ~0.3
        vs the direct uid take's 0.47 on the same 32.5 MB source."""
        cand_bm, gids, key_t = poolg_parts(qq, sh)
        vals, pos = _fast_topk(cand_bm, ks)
        g_of = jnp.take_along_axis(gids, pos // gw, axis=1,
                                   mode="promise_in_bounds")
        uids = g_of * gw + pos % gw
        cand_key = jnp.take_along_axis(
            key_t.T.reshape(t, ng, gw), gids[:, :, None], axis=1,
            mode="promise_in_bounds",
        ).reshape(t, pool)
        key_sel = jnp.take_along_axis(cand_key, pos, axis=1,
                                      mode="promise_in_bounds")
        return vals, uids, key_sel

    def keyh(qq, sh):
        vals, uids, key_sel = keyh_parts(qq, sh)
        return _danger(vals, uids, key_sel)

    def poolu(qq, sh):
        cand_bm, gids, key_t = poolg_parts(qq, sh)
        kp = 128
        av, ap = jax.lax.approx_max_k(cand_bm, kp, recall_target=1.0)
        # w = exact K-th max of the pool: 1-key descending sort of the
        # 128 candidates (no ids to carry). Certificate: every pool
        # element >= w is among the candidates (same count test as
        # _fast_topk); on failure production would lax.cond to the sorted
        # path — cost modeled here by the always-on count.
        avs = -jax.lax.sort(-(av + 0.0))
        w = jax.lax.dynamic_slice_in_dim(avs, K - 1, 1, axis=1)
        row_count = jnp.sum((cand_bm >= w).astype(jnp.int32), axis=1)
        cand_count = jnp.sum((av >= w).astype(jnp.int32), axis=1)
        cert_sel = jnp.all(row_count == cand_count)
        g_of = jnp.take_along_axis(gids, ap // gw, axis=1,
                                   mode="promise_in_bounds")
        uids = g_of * gw + ap % gw
        key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                      mode="promise_in_bounds")
        arg_sel = key_sel & 0x7F
        w_key = m2_sort_key(w)
        a_gids = jnp.where(av > PAD_SIM, uids * SUB + arg_sel, int_max)
        danger_count = jnp.sum((key_sel >= w_key).astype(jnp.int32), axis=1)
        cert = cert_sel & jnp.all(danger_count <= GD)
        _, dpos = jax.lax.top_k(key_sel, GD)
        d_uids = jnp.take_along_axis(uids, dpos, axis=1)
        d_args = jnp.take_along_axis(arg_sel, dpos, axis=1)
        dperm = jnp.argsort(d_uids, axis=1)
        return (av, a_gids, cert,
                jnp.take_along_axis(d_uids, dperm, axis=1),
                jnp.take_along_axis(d_args, dperm, axis=1))

    return [("pool", jax.jit(poolr)),
            ("keytr", jax.jit(keytr)),
            ("keyg", jax.jit(keyg)),
            ("key", jax.jit(keyd)),
            ("keyh", jax.jit(keyh)),
            ("poolu", jax.jit(poolu))]


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
    print(f"transpose = keytr-pool = {(meds['keytr']-meds['pool'])*1e3:+.2f}"
          f" ms; scan = keyg-keytr = {(meds['keyg']-meds['keytr'])*1e3:+.2f}"
          f" ms; poolu vs key: {(meds['poolu']-meds['key'])*1e3:+.2f} ms;"
          f" keyh vs key: {(meds['keyh']-meds['key'])*1e3:+.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
