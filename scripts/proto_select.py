"""Profile the rescore select chain stages on chip (calibrated timing).

Round-3 bench: search_1m = 23.2 ms/batch but bm(8.7) + gather(6.1) leaves
~8 ms unexplained; suspect the [R/16, T] -> [T, R/16] transpose and the
hier select. Also tests the transpose-free select formulation (gather the
candidate sub-maxima in TRANSPOSED layout with take_along_axis(axis=0),
then transpose only the tiny [kb*spb, T] result).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def corrected(label, fn, *args, iters=24, C=0.0277):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    t = (time.perf_counter() - t0) / iters - C / iters
    print(f"{label:>56s}: {t*1e3:9.2f} ms", flush=True)
    return t


def main():
    T, NU, spb, k, kb, ks = 512, 65536, 8, 100, 100, 104
    NB = NU // spb  # 8192
    key = jax.random.PRNGKey(0)
    bms_t = jax.random.normal(key, (NU, T), dtype=jnp.float32)
    _force(bms_t)

    # -- current formulation ---------------------------------------------------
    @jax.jit
    def current(bt):
        bms3 = bt.T.reshape(T, NB, spb)
        bm = jnp.max(bms3, axis=2)  # [T, NB]
        # hier select
        nsup = NB // 8
        b8 = jnp.max(bm.reshape(T, nsup, 8), axis=2)
        _, sup = jax.lax.top_k(b8, kb)
        sup = jnp.sort(sup, axis=1)
        cand_bm = jnp.take_along_axis(
            bm.reshape(T, nsup, 8), sup[:, :, None], axis=1).reshape(T, kb * 8)
        cand_bids = (sup[:, :, None] * 8
                     + jnp.arange(8, dtype=jnp.int32)[None, None, :]
                     ).reshape(T, kb * 8)
        _, pos = jax.lax.top_k(cand_bm, kb)
        bids = jnp.sort(jnp.take_along_axis(cand_bids, pos, axis=1), axis=1)
        # refine to sub-units
        cand_sbm = jnp.take_along_axis(
            bms3, bids[:, :, None], axis=1).reshape(T, kb * spb)
        cand_uids = (bids[:, :, None] * spb
                     + jnp.arange(spb, dtype=jnp.int32)[None, None, :]
                     ).reshape(T, kb * spb)
        _, pos2 = jax.lax.top_k(cand_sbm, ks)
        return jnp.sort(jnp.take_along_axis(cand_uids, pos2, axis=1), axis=1)

    corrected("current select chain (transpose + 2 gathers)", current, bms_t)

    # -- stage split -----------------------------------------------------------
    corrected("  transpose [NU,T]->[T,NU] alone",
              jax.jit(lambda bt: bt.T.reshape(T, NB, spb) + 0.0), bms_t)
    corrected("  bm reduce from transposed",
              jax.jit(lambda bt: jnp.max(bt.T.reshape(T, NB, spb), axis=2)),
              bms_t)

    # -- transpose-free formulation ---------------------------------------------
    @jax.jit
    def notranspose(bt):
        # block maxima in transposed layout: [NB, T]
        bm_t = jnp.max(bt.reshape(NB, spb, T), axis=1)
        bm = bm_t.T  # [T, NB] — only 16 MB
        nsup = NB // 8
        b8 = jnp.max(bm.reshape(T, nsup, 8), axis=2)
        _, sup = jax.lax.top_k(b8, kb)
        sup = jnp.sort(sup, axis=1)
        cand_bm = jnp.take_along_axis(
            bm.reshape(T, nsup, 8), sup[:, :, None], axis=1).reshape(T, kb * 8)
        cand_bids = (sup[:, :, None] * 8
                     + jnp.arange(8, dtype=jnp.int32)[None, None, :]
                     ).reshape(T, kb * 8)
        _, pos = jax.lax.top_k(cand_bm, kb)
        bids = jnp.sort(jnp.take_along_axis(cand_bids, pos, axis=1), axis=1)
        # refine: gather sub-maxima IN TRANSPOSED LAYOUT (per-column rows)
        uidx = (bids[:, :, None] * spb
                + jnp.arange(spb, dtype=jnp.int32)[None, None, :]
                ).reshape(T, kb * spb)           # [T, kb*spb] unit ids
        cand_sbm_t = jnp.take_along_axis(bt, uidx.T, axis=0)  # [kb*spb, T]
        cand_sbm = cand_sbm_t.T                   # small transpose (1.6 MB)
        _, pos2 = jax.lax.top_k(cand_sbm, ks)
        return jnp.sort(jnp.take_along_axis(uidx, pos2, axis=1), axis=1)

    corrected("transpose-free select chain", notranspose, bms_t)

    # equivalence
    a = jax.device_get(current(bms_t))
    b = jax.device_get(notranspose(bms_t))
    print("identical ids:", np.array_equal(a, b), flush=True)

    # final stage variants at c=1664
    c = 1664
    scores = jax.random.normal(jax.random.PRNGKey(1), (T, c), dtype=jnp.float32)
    _force(scores)
    corrected("final top_k [512,1664] direct",
              jax.jit(lambda s: jax.lax.top_k(s, k)), scores)

    @jax.jit
    def range_reduce(s):
        nr = c // 16
        s3 = s.reshape(T, nr, 16)
        rm = jnp.max(s3, axis=2)
        _, rpos = jax.lax.top_k(rm, k)
        rpos = jnp.sort(rpos, axis=1)
        cand = jnp.take_along_axis(s3, rpos[:, :, None], axis=1).reshape(T, k * 16)
        return jax.lax.top_k(cand, k)

    corrected("final range-reduce+top_k [512,1664]", range_reduce, scores)

    # 10M-shape select: NU=78336 spb=8 (block=1024 of sub=128)
    NU2, NB2 = 78336, 9792
    bms2 = jax.random.normal(jax.random.PRNGKey(2), (NU2, T), dtype=jnp.float32)
    _force(bms2)

    @jax.jit
    def current10(bt):
        bms3 = bt.T.reshape(T, NB2, 8)
        bm = jnp.max(bms3, axis=2)
        nsup = NB2 // 8
        b8 = jnp.max(bm.reshape(T, nsup, 8), axis=2)
        _, sup = jax.lax.top_k(b8, kb)
        sup = jnp.sort(sup, axis=1)
        cand_bm = jnp.take_along_axis(
            bm.reshape(T, nsup, 8), sup[:, :, None], axis=1).reshape(T, kb * 8)
        cand_bids = (sup[:, :, None] * 8
                     + jnp.arange(8, dtype=jnp.int32)[None, None, :]
                     ).reshape(T, kb * 8)
        _, pos = jax.lax.top_k(cand_bm, kb)
        bids = jnp.sort(jnp.take_along_axis(cand_bids, pos, axis=1), axis=1)
        cand_sbm = jnp.take_along_axis(
            bms3, bids[:, :, None], axis=1).reshape(T, kb * 8)
        cand_uids = (bids[:, :, None] * 8
                     + jnp.arange(8, dtype=jnp.int32)[None, None, :]
                     ).reshape(T, kb * 8)
        _, pos2 = jax.lax.top_k(cand_sbm, 100)
        return jnp.sort(jnp.take_along_axis(cand_uids, pos2, axis=1), axis=1)

    @jax.jit
    def notranspose10(bt):
        bm_t = jnp.max(bt.reshape(NB2, 8, T), axis=1)
        bm = bm_t.T
        nsup = NB2 // 8
        b8 = jnp.max(bm.reshape(T, nsup, 8), axis=2)
        _, sup = jax.lax.top_k(b8, kb)
        sup = jnp.sort(sup, axis=1)
        cand_bm = jnp.take_along_axis(
            bm.reshape(T, nsup, 8), sup[:, :, None], axis=1).reshape(T, kb * 8)
        cand_bids = (sup[:, :, None] * 8
                     + jnp.arange(8, dtype=jnp.int32)[None, None, :]
                     ).reshape(T, kb * 8)
        _, pos = jax.lax.top_k(cand_bm, kb)
        bids = jnp.sort(jnp.take_along_axis(cand_bids, pos, axis=1), axis=1)
        uidx = (bids[:, :, None] * 8
                + jnp.arange(8, dtype=jnp.int32)[None, None, :]
                ).reshape(T, kb * 8)
        cand_sbm = jnp.take_along_axis(bt, uidx.T, axis=0).T
        _, pos2 = jax.lax.top_k(cand_sbm, 100)
        return jnp.sort(jnp.take_along_axis(uidx, pos2, axis=1), axis=1)

    corrected("10M-shape current select", current10, bms2, iters=12)
    corrected("10M-shape transpose-free select", notranspose10, bms2, iters=12)
    a = jax.device_get(current10(bms2))
    b = jax.device_get(notranspose10(bms2))
    print("identical ids (10M shape):", np.array_equal(a, b), flush=True)


if __name__ == "__main__":
    main()
