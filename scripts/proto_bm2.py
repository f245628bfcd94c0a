"""Isolate the Mosaic crash in the two-level blockmax kernel."""

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


def timeit(label, fn, *args, iters=3):
    try:
        out = fn(*args)
        _force(out)
    except Exception as e:
        print(f"{label:>44s}: FAILED {str(e)[:160]}", flush=True)
        return None
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:>44s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


# -- variant A: swapped dot [rt, T], sublane-group reductions, two outputs --


def _kern_a(S, limit_ref, q_ref, s_ref, bms_ref, bm_ref):
    sims = jax.lax.dot_general(
        s_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rt, T]
    rt, t = sims.shape
    row0 = pl.program_id(0) * rt
    local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
    sims = jnp.where(local < limit_ref[0], sims, PAD_SIM)
    bms = jnp.max(sims.reshape(rt // S, S, t), axis=1)  # [rt/S, T]
    bms_ref[:] = bms
    bm_ref[:] = jnp.max(bms.reshape(rt // 128, 128 // S, t), axis=1)


@functools.partial(jax.jit, static_argnames=("rt", "S"))
def bm2_a(queries, shard, valid_rows, rt=1024, S=16):
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
        functools.partial(_kern_a, S),
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


# -- variant B: original dot, lane-group reduce, SINGLE bms output, no .T --


def _kern_b(S, limit_ref, q_ref, s_ref, bms_ref):
    sims = jax.lax.dot_general(
        q_ref[:], s_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, rt]
    t, rt = sims.shape
    row0 = pl.program_id(0) * rt
    local = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, rt), 1)
    sims = jnp.where(local < limit_ref[0], sims, PAD_SIM)
    bms_ref[:] = jnp.max(sims.reshape(t, rt // S, S), axis=2)  # [T, rt/S]


@functools.partial(jax.jit, static_argnames=("rt", "S"))
def bm2_b(queries, shard, valid_rows, rt=2048, S=16):
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
            pl.BlockSpec((t, rt // S), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    (bms,) = pl.pallas_call(
        functools.partial(_kern_b, S),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t, r // S), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + (r // S) * t * 4,
            transcendentals=0,
        ),
    )(limit, queries, shard)
    return bms


def main():
    R, D = 1_001_472, 768
    T = 512
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (R, D), dtype=jnp.bfloat16)
    _force(data)
    q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=jnp.bfloat16)
    _force(q)

    for rt in (1024, 2048):
        timeit(f"A swapped-dot two-out S=16 rt={rt}",
               lambda qq, dd: bm2_a(qq, dd, R, rt=rt, S=16), q, data)
    timeit("B lane-reduce single-out S=16 rt=2048",
           lambda qq, dd: bm2_b(qq, dd, R, rt=2048, S=16), q, data)

    # correctness of A vs direct XLA on a small slice
    bms, bm = bm2_a(q, data, R, rt=1024, S=16)
    sm = jnp.dot(q[:8].astype(jnp.float32), data[:4096].astype(jnp.float32).T,
                 precision=jax.lax.Precision.HIGHEST)
    ref_bms = np.asarray(jax.device_get(jnp.max(sm.reshape(8, 256, 16), axis=2)))
    got = np.asarray(jax.device_get(bms[:256, :8])).T
    print("A bms matches XLA reduce:",
          bool(np.allclose(ref_bms, got, atol=2e-2)),
          float(np.max(np.abs(ref_bms - got))), flush=True)


if __name__ == "__main__":
    main()
