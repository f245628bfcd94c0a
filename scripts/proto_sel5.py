"""Selection-stack reformulation sweep (1M x 768, sub=32 geometry).

The round-4 profile puts the post-bm selection stack at ~3.2 ms/tile
(hier_select 1.05 + refine 1.18 + pool_gathers 0.99) against a ~0.8 ms
traffic floor. This measures isolated variants over PRECOMPUTED bms_t /
key_t / bm_t inputs (no bm pass), interleaved min-of-rounds with the sync
floor subtracted:

  S0  current: bm.T -> 8-sup hier select -> refine gather -> pool key gather
  S1  S0 with flat-index jnp.take (no bms/key transposes)
  S2  sup-direct: select superblocks, gather 32-unit spans (skip block level)
  S3  S2 with flat takes
  S4  direct unit-level _fast_topk on bms.T [T, nsub], key fetch for winners
  P*  pieces: transposes and single gathers

Usage: python scripts/proto_sel5.py
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

R, D, block = 1_015_808, 768, 128
sub = int(os.environ.get("SUB", "32"))
t = 512
k, ks = 100, 104
nb = R // block
nsub = R // sub
spb = block // sub
kb = min(k, nb)
sup_w = 8
nsup = nb // sup_w
upw = sup_w * spb          # units per superblock
pool = kb * spb
pool2 = kb * upw


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def hier_select(bm):
    b8 = jnp.max(bm.reshape(t, nsup, sup_w), axis=2)
    ns = min(kb, nsup)
    _, sup = T._fast_topk(b8, ns)
    sup = jnp.sort(sup, axis=1)
    cand_bm0 = jnp.take_along_axis(
        bm.reshape(t, nsup, sup_w), sup[:, :, None], axis=1
    ).reshape(t, ns * sup_w)
    cand_bids = (
        sup[:, :, None] * sup_w
        + jnp.arange(sup_w, dtype=jnp.int32)[None, None, :]
    ).reshape(t, ns * sup_w)
    _, pos = T._fast_topk(cand_bm0, kb)
    bids = jnp.take_along_axis(cand_bids, pos, axis=1)
    return jnp.sort(bids, axis=1)


def s0(bms_t, key_t, bm_t):
    bm = bm_t.T
    bids = hier_select(bm)
    bms3 = bms_t.T.reshape(t, nb, spb)
    cand_bm = jnp.take_along_axis(
        bms3, bids[:, :, None], axis=1).reshape(t, pool)
    cand_uids = (
        bids[:, :, None] * spb
        + jnp.arange(spb, dtype=jnp.int32)[None, None, :]
    ).reshape(t, pool)
    vals, pos = T._fast_topk(cand_bm, ks)
    uids = jnp.take_along_axis(cand_uids, pos, axis=1)
    key3 = key_t.T.reshape(t, nb, spb)
    cand_key = jnp.take_along_axis(
        key3, bids[:, :, None], axis=1).reshape(t, pool)
    key_sel = jnp.take_along_axis(cand_key, pos, axis=1)
    return vals, uids, key_sel


def _flat_fetch(src_t, bids, width):
    """out[q, j*width+s] = src_t[bids[q,j]*width + s, q] via 1-D take."""
    rows = (
        bids[:, :, None] * width
        + jnp.arange(width, dtype=jnp.int32)[None, None, :]
    ).reshape(t, bids.shape[1] * width)
    qcol = jnp.arange(t, dtype=jnp.int32)[:, None]
    return jnp.take(src_t.reshape(-1), rows * t + qcol, axis=0)


def s1(bms_t, key_t, bm_t):
    bm = bm_t.T
    bids = hier_select(bm)
    cand_bm = _flat_fetch(bms_t, bids, spb)
    cand_uids = (
        bids[:, :, None] * spb
        + jnp.arange(spb, dtype=jnp.int32)[None, None, :]
    ).reshape(t, pool)
    vals, pos = T._fast_topk(cand_bm, ks)
    uids = jnp.take_along_axis(cand_uids, pos, axis=1)
    cand_key = _flat_fetch(key_t, bids, spb)
    key_sel = jnp.take_along_axis(cand_key, pos, axis=1)
    return vals, uids, key_sel


def _sup_select(bm_t):
    """Top-kb superblocks from bm_t [nb, T] (reduce small, transpose small)."""
    bsup_t = jnp.max(bm_t.reshape(nsup, sup_w, t), axis=1)  # [nsup, T]
    bsup = bsup_t.T
    ns = min(kb, nsup)
    _, sup = T._fast_topk(bsup, ns)
    return jnp.sort(sup, axis=1)


def s2(bms_t, key_t, bm_t):
    sup = _sup_select(bm_t)
    bms3 = bms_t.T.reshape(t, nsup, upw)
    cand_bm = jnp.take_along_axis(
        bms3, sup[:, :, None], axis=1).reshape(t, pool2)
    cand_uids = (
        sup[:, :, None] * upw
        + jnp.arange(upw, dtype=jnp.int32)[None, None, :]
    ).reshape(t, pool2)
    vals, pos = T._fast_topk(cand_bm, ks)
    uids = jnp.take_along_axis(cand_uids, pos, axis=1)
    key3 = key_t.T.reshape(t, nsup, upw)
    cand_key = jnp.take_along_axis(
        key3, sup[:, :, None], axis=1).reshape(t, pool2)
    key_sel = jnp.take_along_axis(cand_key, pos, axis=1)
    return vals, uids, key_sel


def s3(bms_t, key_t, bm_t):
    sup = _sup_select(bm_t)
    cand_bm = _flat_fetch(bms_t, sup, upw)
    cand_uids = (
        sup[:, :, None] * upw
        + jnp.arange(upw, dtype=jnp.int32)[None, None, :]
    ).reshape(t, pool2)
    vals, pos = T._fast_topk(cand_bm, ks)
    uids = jnp.take_along_axis(cand_uids, pos, axis=1)
    cand_key = _flat_fetch(key_t, sup, upw)
    key_sel = jnp.take_along_axis(cand_key, pos, axis=1)
    return vals, uids, key_sel


def s4(bms_t, key_t, bm_t):
    bms = bms_t.T                      # [T, nsub]
    vals, uids = T._fast_topk(bms, ks)
    key_sel = _flat_fetch(key_t, uids, 1)
    return vals, uids, key_sel


def p_transpose_bms(bms_t, key_t, bm_t):
    return bms_t.T + 1.0


def p_transpose_both(bms_t, key_t, bm_t):
    return bms_t.T + 1.0, key_t.T + 1


def p_refine_take(bms_t, key_t, bm_t):
    bids = jnp.broadcast_to(
        jnp.arange(kb, dtype=jnp.int32)[None, :] * 7, (t, kb))
    bms3 = bms_t.T.reshape(t, nb, spb)
    return jnp.take_along_axis(bms3, bids[:, :, None], axis=1)


def p_refine_flat(bms_t, key_t, bm_t):
    bids = jnp.broadcast_to(
        jnp.arange(kb, dtype=jnp.int32)[None, :] * 7, (t, kb))
    return _flat_fetch(bms_t, bids, spb)


def main():
    kq = jax.random.PRNGKey(0)
    bms_t = jax.random.normal(kq, (nsub, t), dtype=jnp.float32)
    key_t = jax.random.randint(
        jax.random.PRNGKey(1), (nsub, t), 0, 1 << 30, dtype=jnp.int32)
    bm_t = jnp.max(bms_t.reshape(nb, spb, t), axis=1)
    _force(bms_t); _force(key_t); _force(bm_t)

    variants = [
        ("S0 current", jax.jit(s0)),
        ("S1 flat-take", jax.jit(s1)),
        ("S2 sup-direct", jax.jit(s2)),
        ("S3 sup+flat", jax.jit(s3)),
        ("S4 unit-direct", jax.jit(s4)),
        ("P bms.T", jax.jit(p_transpose_bms)),
        ("P both.T", jax.jit(p_transpose_both)),
        ("P refine take", jax.jit(p_refine_take)),
        ("P refine flat", jax.jit(p_refine_flat)),
    ]
    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    for name, fn in variants:
        _force(fn(bms_t, key_t, bm_t))

    # cross-check S* agreement on vals/uids
    outs = [np.asarray(jax.device_get(fn(bms_t, key_t, bm_t)[1]))
            for _, fn in variants[:5]]
    for i, o in enumerate(outs[1:], 1):
        tag = variants[i][0]
        print(f"uids {tag} == S0: {np.array_equal(o, outs[0])}", flush=True)

    best = {n: 1e9 for n, _ in variants}
    sync_best = 1e9
    for rnd in range(3):
        out = tiny(bms_t); _force(out)
        t0 = time.perf_counter()
        for _ in range(16):
            out = tiny(bms_t)
        _force(out)
        sync_best = min(sync_best, (time.perf_counter() - t0) / 16)
        for n, fn in variants:
            out = fn(bms_t, key_t, bm_t)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(16):
                out = fn(bms_t, key_t, bm_t)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / 16)
        print(f"round {rnd} sync={sync_best*1e3:.2f}", flush=True)
    print(f"\nsync floor/iter ~{sync_best*1e3:.2f} ms", flush=True)
    for n, _ in variants:
        print(f"{n:>16s}: {(best[n]-sync_best)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
