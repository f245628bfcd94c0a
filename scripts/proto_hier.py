"""Prototype the hierarchical (128 -> 32 -> element) selection pipeline.

Chain (all exact, same tie discipline as the oracle at every level):
  kernel: sims [T,R] f32 + bm32 [R/32, T] (or bm128 + XLA bm32 fallback)
  bm128 = max over groups of 4 of bm32
  block select: top-k 128-blocks by (max desc, idx asc)   [approx+cert fast path]
  gather bm32 of selected blocks  [T, kb, 4]   (tiny)
  sub select: top-k 32-subblocks  [T, 4*kb] -> kb ids     (tiny)
  gather sims 32-wide             [T, kb, 32] (4x smaller than 128-wide)
  final top_k                     [T, kb*32]  (4x narrower)
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


def timeit(label, fn, *args, iters=8):
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


def make_kernel(sub: int):
    def k(limit_ref, q_ref, s_ref, sims_ref, bm_ref):
        sims = jax.lax.dot_general(
            q_ref[:], s_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t, rt = sims.shape
        row0 = pl.program_id(0) * rt
        local = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, rt), 1)
        sims = jnp.where(local < limit_ref[0], sims, PAD_SIM)
        sims_ref[:] = sims
        bm_ref[:] = jnp.max(sims.reshape(t, rt // sub, sub), axis=2).T

    return k


@functools.partial(jax.jit, static_argnames=("sub", "rt"))
def mm_bmsub(queries, shard, valid_rows, sub=32, rt=1024):
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
            pl.BlockSpec((t, rt), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt // sub, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        make_kernel(sub),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, r), jnp.float32),
            jax.ShapeDtypeStruct((r // sub, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + t * r * 4,
            transcendentals=0,
        ),
    )(limit, queries, shard)


def main():
    T, D = 512, 768
    R = 1_015_808  # padded 1M
    k, kp = 100, 128
    SUB = 32
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (R, D), dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=jnp.bfloat16)
    _force(data); _force(q)

    # 1) does the width-32 in-kernel blockmax compile?
    try:
        sims, bm32t = mm_bmsub(q, data, 1_000_000, sub=SUB)
        _force(bm32t)
        print("in-kernel bm32: COMPILES", flush=True)
        timeit("kernel mm+bm32", mm_bmsub, q, data, 1_000_000)
        kernel_ok = True
    except Exception as e:
        print(f"in-kernel bm32 FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        kernel_ok = False

    if not kernel_ok:
        return

    NB = R // 128
    NS = R // SUB

    @jax.jit
    def full_hier(qq, dd):
        sims, bm32t = mm_bmsub(qq, dd, 1_000_000, sub=SUB)
        bm32 = bm32t.T  # [T, NS]
        bm128 = jnp.max(bm32.reshape(T, NB, 128 // SUB), axis=2)  # [T, NB]
        # --- level 1: top-k 128-blocks (approx fast path + certificate)
        av, ap = jax.lax.approx_max_k(bm128, kp, recall_target=1.0)
        w = av[:, k - 1:k]
        cert = jnp.sum((av >= w).astype(jnp.int32), axis=1) < kp

        def fast(bm, avap):
            av_, ap_ = avap
            neg, ids = jax.lax.sort((-av_, ap_), num_keys=2)
            return ids[:, :k]

        def exact(bm, avap):
            _, ids = jax.lax.top_k(bm, k)
            return ids

        bids = jax.lax.cond(jnp.all(cert), fast, exact, bm128, (av, ap))
        bids = jnp.sort(bids, axis=1)  # ascending: oracle tie order
        # --- level 2: sub-blocks of selected blocks
        sub_per = 128 // SUB
        bm32r = bm32.reshape(T, NB, sub_per)
        cand32 = jnp.take_along_axis(bm32r, bids[:, :, None], axis=1)
        cand32 = cand32.reshape(T, k * sub_per)
        sub_ids_local = (bids[:, :, None] * sub_per
                         + jnp.arange(sub_per, dtype=jnp.int32)[None, None, :]
                         ).reshape(T, k * sub_per)
        _, spos = jax.lax.top_k(cand32, k)
        sids = jnp.take_along_axis(sub_ids_local, spos, axis=1)
        sids = jnp.sort(sids, axis=1)
        # --- level 3: elements of selected sub-blocks
        sims3 = sims.reshape(T, NS, SUB)
        cand = jnp.take_along_axis(sims3, sids[:, :, None], axis=1)
        cand = cand.reshape(T, k * SUB)
        cand_gids = (sids[:, :, None] * SUB
                     + jnp.arange(SUB, dtype=jnp.int32)[None, None, :]
                     ).reshape(T, k * SUB)
        tv, tpos = jax.lax.top_k(cand, k)
        tids = jnp.take_along_axis(cand_gids, tpos, axis=1)
        return tv, tids

    dt = timeit("FULL hier tile T=512", full_hier, q, data)
    print(f"    -> projected 1024-batch: {1024 / (2 * dt):,.0f} q/s", flush=True)

    # exactness vs oracle on this random case
    tv, tids = jax.device_get(full_hier(q, data))
    sims_ref = jax.device_get(
        jax.jit(lambda a, b: jnp.dot(a, b.T, preferred_element_type=jnp.float32))(
            q[:8], data))
    for r in range(8):
        s = sims_ref[r][:1_000_000]
        order = np.argsort(-s, kind="stable")[:k]
        if not np.array_equal(order, tids[r]):
            print(f"row {r}: MISMATCH vs oracle", flush=True)
            break
    else:
        print("exactness vs oracle (8 rows): OK", flush=True)


if __name__ == "__main__":
    main()
