"""bm-pass efficiency hunt (1M x 768, T=512): why is bm-only 30% MXU when
the sims-writing fused kernel hits 66%?

Variants:
  ref : round-2 matmul_blockmax (sims -> HBM + bm128) — the 66% baseline
  V1  : swapped-dot two-level bm-only at rt in {512, 1024, 2048}
  V2  : sims -> VMEM scratch, reduce from scratch (streamed dot output)
  V3  : sims -> HBM output (never read) + bmS + bm128 (hide reduce under write)
  V4  : dot in column chunks, reduce each chunk immediately (small registers)
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


def timeit(label, fn, *args, iters=3, flops=None):
    try:
        out = fn(*args)
        _force(out)
    except Exception as e:
        print(f"{label:>40s}: FAILED {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    mxu = f"  MXU {flops / dt / 197e12 * 100:5.1f}%" if flops else ""
    print(f"{label:>40s}: {dt * 1e3:9.2f} ms{mxu}", flush=True)
    return dt


# -- V1: swapped dot, sublane reductions ------------------------------------


def _kern_v1(S, limit_ref, q_ref, s_ref, bms_ref, bm_ref):
    sims = jax.lax.dot_general(
        s_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rt, t = sims.shape
    row0 = pl.program_id(0) * rt
    local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
    sims = jnp.where(local < limit_ref[0], sims, PAD_SIM)
    bms = jnp.max(sims.reshape(rt // S, S, t), axis=1)
    bms_ref[:] = bms
    bm_ref[:] = jnp.max(bms.reshape(rt // 128, 128 // S, t), axis=1)


@functools.partial(jax.jit, static_argnames=("rt", "S"))
def bm2_v1(queries, shard, valid_rows, rt=1024, S=16):
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
            pl.BlockSpec((rt // S, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt // 128, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kern_v1, S),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r // S, t), jnp.float32),
            jax.ShapeDtypeStruct((r // 128, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + (r // S) * t * 4,
            transcendentals=0,
        ),
    )(limit, queries, shard)


# -- V2: dot -> VMEM scratch, reduce from scratch ----------------------------


def _kern_v2(S, limit_ref, q_ref, s_ref, bms_ref, bm_ref, scratch):
    scratch[:] = jax.lax.dot_general(
        s_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rt, t = scratch.shape
    row0 = pl.program_id(0) * rt
    local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
    sims = jnp.where(local < limit_ref[0], scratch[:], PAD_SIM)
    bms = jnp.max(sims.reshape(rt // S, S, t), axis=1)
    bms_ref[:] = bms
    bm_ref[:] = jnp.max(bms.reshape(rt // 128, 128 // S, t), axis=1)


@functools.partial(jax.jit, static_argnames=("rt", "S"))
def bm2_v2(queries, shard, valid_rows, rt=1024, S=16):
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
            pl.BlockSpec((rt // S, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt // 128, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((rt, t), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kern_v2, S),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r // S, t), jnp.float32),
            jax.ShapeDtypeStruct((r // 128, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + (r // S) * t * 4,
            transcendentals=0,
        ),
    )(limit, queries, shard)


# -- V3: sims -> HBM (never read) + two-level maxima -------------------------


def _kern_v3(S, limit_ref, q_ref, s_ref, sims_ref, bms_ref, bm_ref):
    sims = jax.lax.dot_general(
        s_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rt, t = sims.shape
    row0 = pl.program_id(0) * rt
    local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
    sims = jnp.where(local < limit_ref[0], sims, PAD_SIM)
    sims_ref[:] = sims
    bms = jnp.max(sims.reshape(rt // S, S, t), axis=1)
    bms_ref[:] = bms
    bm_ref[:] = jnp.max(bms.reshape(rt // 128, 128 // S, t), axis=1)


@functools.partial(jax.jit, static_argnames=("rt", "S"))
def bm2_v3(queries, shard, valid_rows, rt=1024, S=16):
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
            pl.BlockSpec((rt, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt // S, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt // 128, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kern_v3, S),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r, t), jnp.float32),
            jax.ShapeDtypeStruct((r // S, t), jnp.float32),
            jax.ShapeDtypeStruct((r // 128, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + r * t * 4,
            transcendentals=0,
        ),
    )(limit, queries, shard)


# -- V4: dot in column chunks, reduce immediately ----------------------------


def _kern_v4(S, CH, limit_ref, q_ref, s_ref, bms_ref, bm_ref):
    rt = s_ref.shape[0]
    t = q_ref.shape[0]
    row0 = pl.program_id(0) * rt
    outs = []
    for c in range(rt // CH):
        part = jax.lax.dot_general(
            s_ref[c * CH:(c + 1) * CH], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [CH, T]
        local = (row0 + c * CH
                 + jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0))
        part = jnp.where(local < limit_ref[0], part, PAD_SIM)
        outs.append(jnp.max(part.reshape(CH // S, S, t), axis=1))
    bms = jnp.concatenate(outs, axis=0)
    bms_ref[:] = bms
    bm_ref[:] = jnp.max(bms.reshape(rt // 128, 128 // S, t), axis=1)


@functools.partial(jax.jit, static_argnames=("rt", "S", "CH"))
def bm2_v4(queries, shard, valid_rows, rt=2048, S=16, CH=512):
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
            pl.BlockSpec((rt // S, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt // 128, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kern_v4, S, CH),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r // S, t), jnp.float32),
            jax.ShapeDtypeStruct((r // 128, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + (r // S) * t * 4,
            transcendentals=0,
        ),
    )(limit, queries, shard)


def main():
    R, D = 1_001_472, 768
    T = 512
    FL = 2 * T * D * R
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (R, D), dtype=jnp.bfloat16)
    _force(data)
    q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=jnp.bfloat16)
    _force(q)

    from better_search_rag_rust_tpu.ops.topk_pallas import matmul_blockmax

    timeit("ref matmul_blockmax (sims+bm128)",
           lambda qq, dd: matmul_blockmax(qq, dd, R), q, data, flops=FL)

    for rt in (512, 1024, 2048):
        timeit(f"V1 swapped two-level rt={rt}",
               lambda qq, dd: bm2_v1(qq, dd, R, rt=rt, S=16), q, data, flops=FL)
    timeit("V2 scratch-sims rt=1024",
           lambda qq, dd: bm2_v2(qq, dd, R, rt=1024, S=16), q, data, flops=FL)
    timeit("V3 sims->HBM + two-level rt=1024",
           lambda qq, dd: bm2_v3(qq, dd, R, rt=1024, S=16), q, data, flops=FL)
    for ch in (256, 512, 1024):
        timeit(f"V4 chunked-dot rt=2048 CH={ch}",
               lambda qq, dd: bm2_v4(qq, dd, R, rt=2048, S=16, CH=ch),
               q, data, flops=FL)


if __name__ == "__main__":
    main()
