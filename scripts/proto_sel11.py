"""A/B the refine tail: pos-arithmetic uids + direct key gather.

proto_refine.py measured the small pos-takes at 0.39/0.52 ms — as much as
the 65 MB source scans. Candidate rewrite, exact-value identical:

* uids = gids[pos // gw] * gw + pos % gw    (tiny [T, kg] gather + VPU)
* key_sel = take_along_axis(key_t.T, uids)  (ONE 65 MB scan, replacing the
  pool key gather AND the pos take)

A = current chain, B = rewrite, C = B with kp=128 fast_topk. Interleaved
same-process rounds (cross-process drift is +-20%).

Usage: python scripts/proto_sel11.py
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
    bm2_emit_width, matmul_blockmax2_only, pick_bm2_row_tile,
)

R, D, sub, block = 1_015_808, 768, 32, 128
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


def _fast_topk_kp(x, kk, kp):
    n = x.shape[1]
    kp = min(n, kp)
    av, ap = jax.lax.approx_max_k(x, kp, recall_target=1.0)
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


def main():
    shard = jax.random.normal(jax.random.PRNGKey(0), (R, D),
                              dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (t, D), dtype=jnp.bfloat16)
    _force(shard); _force(q)
    valid = jnp.int32(VALID)

    def upto_select(qq, sh):
        bms_t, key_t, bmi_t = matmul_blockmax2_only(
            qq, sh, valid, sub=sub, block=block, emit_block=bool(ew),
            emit_argmax=True, emit_width=ew or block)
        upg = (gw * sub) // ew
        gmax = jnp.max(bmi_t.T.reshape(t, ng, upg), axis=2)
        _, gids = T._fast_topk(gmax, kg)
        gids = jnp.sort(gids, axis=1)
        bms3 = bms_t.T.reshape(t, ng, gw)
        cand_bm = jnp.take_along_axis(
            bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
        ).reshape(t, pool)
        return key_t, gids, cand_bm

    def chain_a(qq, sh):
        key_t, gids, cand_bm = upto_select(qq, sh)
        vals, pos = T._fast_topk(cand_bm, ks)
        cand_uids = (
            gids[:, :, None] * gw
            + jnp.arange(gw, dtype=jnp.int32)[None, None, :]
        ).reshape(t, pool)
        uids = jnp.take_along_axis(cand_uids, pos, axis=1)
        key3 = key_t.T.reshape(t, ng, gw)
        cand_key = jnp.take_along_axis(
            key3, gids[:, :, None], axis=1, mode="promise_in_bounds"
        ).reshape(t, pool)
        key_sel = jnp.take_along_axis(cand_key, pos, axis=1)
        return vals, uids, key_sel

    def _chain_b(qq, sh, ftk):
        key_t, gids, cand_bm = upto_select(qq, sh)
        vals, pos = ftk(cand_bm)
        g_of = jnp.take_along_axis(
            gids, pos // gw, axis=1, mode="promise_in_bounds")
        uids = g_of * gw + pos % gw
        key2 = key_t.T  # [T, nsub]
        key_sel = jnp.take_along_axis(
            key2, uids, axis=1, mode="promise_in_bounds")
        return vals, uids, key_sel

    def chain_b(qq, sh):
        return _chain_b(qq, sh, lambda x: T._fast_topk(x, ks))

    def chain_c(qq, sh):
        return _chain_b(qq, sh, lambda x: _fast_topk_kp(x, ks, 128))

    fns = [("A current", jax.jit(chain_a)),
           ("B rewrite", jax.jit(chain_b)),
           ("C B+kp128", jax.jit(chain_c))]
    # value check
    outs = [tuple(np.asarray(jax.device_get(x)) for x in fn(q, shard))
            for _, fn in fns]
    for nm, o in zip(("B", "C"), outs[1:]):
        same = all(np.array_equal(a, b) for a, b in zip(outs[0], o))
        print(f"identical A vs {nm}: {same}", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    best = {n: 1e9 for n, _ in fns}
    for rnd in range(5):
        out = tiny(q); _force(out)
        t0 = time.perf_counter()
        for _ in range(16):
            out = tiny(q)
        _force(out)
        sync = (time.perf_counter() - t0) / 16
        for n, fn in fns:
            out = fn(q, shard)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(16):
                out = fn(q, shard)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / 16 - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n.split()[0]}={best[n]*1e3:.2f}" for n, _ in fns),
              flush=True)
    for n, _ in fns:
        print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
