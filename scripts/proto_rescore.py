"""Prototype: sims-free 'rescore' pipeline for huge low-dim stores.

  pass 1: Pallas matmul -> block maxima ONLY (no [T,R] sims write)
  select: global top-k blocks per query from bm [T, R/128]
  gather: the selected blocks' STORE ROWS  [T, k*128, D]
  rescore: einsum('td,tcd->tc') f32  (bitwise == the big matmul: same K order)
  final:  top_k over [T, k*128]

Wins when k*128*D < 2*R (rescore bytes < sims write+rescan): true for
10M x 256, false for 1M x 768. Unknown: the store-row gather lowering.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_SIM = -3.0


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(slice(0, 1) for _ in range(leaf.ndim))
    np.asarray(jax.device_get(leaf[idx]))


def timeit(label, fn, *args, iters=6):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:>40s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


def _bm_only_kernel(limit_ref, q_ref, s_ref, bm_ref):
    sims = jax.lax.dot_general(
        q_ref[:], s_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t, rt = sims.shape
    row0 = pl.program_id(0) * rt
    local = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, rt), 1)
    sims = jnp.where(local < limit_ref[0], sims, PAD_SIM)
    bm_ref[:] = jnp.max(sims.reshape(t, rt // 128, 128), axis=2).T


@functools.partial(jax.jit, static_argnames=("rt",))
def bm_only(queries, shard, valid_rows, rt=8192):
    t, d = queries.shape
    r, _ = shard.shape
    limit = jnp.asarray(valid_rows, dtype=jnp.int32).reshape((1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // rt,),
        in_specs=[
            pl.BlockSpec((t, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rt // 128, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    (bm,) = pl.pallas_call(
        _bm_only_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((r // 128, t), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + (r // 128) * t * 4,
            transcendentals=0,
        ),
    )(limit, queries, shard)
    return bm


def main():
    R, D = 10_027_008, 256
    k = 100
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (R, D), dtype=jnp.bfloat16)
    _force(data)

    for T in (512, 1024):
        q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=jnp.bfloat16)
        _force(q)
        # pick rt: vmem = 2*rt*D*2 + 2*(rt/128)*T*4 + T*D*2 <= 12MB
        rt = 4096  # 8192 overflows Mosaic's double-buffered VMEM here
        while 2 * rt * D * 2 + 2 * (rt // 128) * T * 4 + T * D * 2 > 12 << 20:
            rt //= 2
        while R % rt:
            rt //= 2
        print(f"T={T} rt={rt}", flush=True)

        try:
            timeit(f"bm-only kernel T={T}", lambda qq, dd: bm_only(qq, dd, R, rt=rt),
                   q, data, iters=3)
        except Exception as e:
            print(f"bm-only FAILED: {str(e)[:200]}", flush=True)
            continue

        bm = bm_only(q, data, R, rt=rt).T  # [T, NB]
        NB = bm.shape[1]
        _force(bm)

        @jax.jit
        def select(b):
            # hierarchical: 1024-row superblocks then refine
            b8 = jnp.max(b.reshape(T, NB // 8, 8), axis=2)
            _, sup = jax.lax.top_k(b8, k)  # [T, k] superblocks
            sup = jnp.sort(sup, axis=1)
            cand = jnp.take_along_axis(
                b.reshape(T, NB // 8, 8), sup[:, :, None], axis=1
            ).reshape(T, k * 8)
            cand_ids = (sup[:, :, None] * 8
                        + jnp.arange(8, dtype=jnp.int32)[None, None, :]
                        ).reshape(T, k * 8)
            _, pos = jax.lax.top_k(cand, k)
            return jnp.sort(jnp.take_along_axis(cand_ids, pos, axis=1), axis=1)

        timeit(f"hier block select T={T}", select, bm)
        bids = select(bm)
        _force(bids)

        @jax.jit
        def gather_rows(dd, ids):
            # [T, k] block ids -> [T, k*128] row ids -> rows [T, k*128, D]
            rows = (ids[:, :, None] * 128
                    + jnp.arange(128, dtype=jnp.int32)[None, None, :]
                    ).reshape(T, k * 128)
            return jnp.take(dd, rows.reshape(-1), axis=0).reshape(T, k * 128, D)

        timeit(f"store-row gather T={T}", gather_rows, data, bids, iters=3)

        @jax.jit
        def rescore_full(qq, dd, ids):
            rows = (ids[:, :, None] * 128
                    + jnp.arange(128, dtype=jnp.int32)[None, None, :]
                    ).reshape(T, k * 128)
            g = jnp.take(dd, rows.reshape(-1), axis=0).reshape(T, k * 128, D)
            sims = jnp.einsum("td,tcd->tc", qq, g,
                              preferred_element_type=jnp.float32)
            tv, tp = jax.lax.top_k(sims, k)
            return tv, jnp.take_along_axis(rows, tp, axis=1)

        dt = timeit(f"gather+rescore+final T={T}", rescore_full, q, data, bids,
                    iters=3)

        # bitwise check: rescored sims == direct matmul sims for those rows
        tv, ti = jax.device_get(rescore_full(q, data, bids))
        direct = jax.device_get(jax.jit(
            lambda qq, dd: jnp.einsum("td,cd->tc", qq, dd,
                                      preferred_element_type=jnp.float32)
        )(q[:4], data[:4096]))
        # compare a few entries present in both
        ok = True
        for t_ in range(4):
            for j in range(k):
                r_ = int(ti[t_, j])
                if r_ < 4096:
                    if direct[t_, r_] != tv[t_, j]:
                        ok = False
                        print(f"BITWISE MISMATCH t={t_} row={r_}: "
                              f"{direct[t_, r_]} vs {tv[t_, j]}", flush=True)
        print(f"bitwise rescore == direct matmul: {ok}", flush=True)


if __name__ == "__main__":
    main()
