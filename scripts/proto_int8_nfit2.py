"""Finer N-fit decomposition of the 1M x 768 int8 tail's two costly
stages (proto_int8_nfit measured pool +0.90 ms, key +0.62 ms):

  gsel    -> +poolg  (bms_t.T transpose + group gather; NO topk)
          -> +pool   (+ _fast_topk(pool -> ks) + uid arithmetic)
          -> +keyg   (+ key_t.T transpose + key take at uids; NO selects)
          -> +key    (+ w_key / danger count / top_k(gd) / argsort)

The poolg-gsel and keyg-pool deltas are the costs a [T, R/sub]-oriented
kernel emission would remove; the pool-poolg and key-keyg deltas are
irreducible selection VPU work.

Usage: python scripts/proto_int8_nfit2.py [n1=8] [n2=32] [rounds=4]
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

    def gsel(qq, sh):
        gids, _, _ = gsel_parts(qq, sh)
        return gids

    def poolg_parts(qq, sh):
        gids, bms_t, key_t = gsel_parts(qq, sh)
        bms3 = bms_t.T.reshape(t, ng, gw)
        cand_bm = jnp.take_along_axis(
            bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
        ).reshape(t, pool)
        return cand_bm, gids, key_t

    def poolg(qq, sh):
        cand_bm, _, _ = poolg_parts(qq, sh)
        return cand_bm

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

    def keyg_parts(qq, sh):
        vals, uids, key_t = pool_parts(qq, sh)
        key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                      mode="promise_in_bounds")
        return vals, uids, key_sel

    def keyg(qq, sh):
        return keyg_parts(qq, sh)[2]

    def keyd(qq, sh):
        vals, uids, key_sel = keyg_parts(qq, sh)
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

    return [("gsel", jax.jit(gsel)),
            ("poolg", jax.jit(poolg)),
            ("pool", jax.jit(poolr)),
            ("keyg", jax.jit(keyg)),
            ("key", jax.jit(keyd))]


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
