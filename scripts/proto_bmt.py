"""Chip test: transposed-operand bm kernel.

(a) Does Mosaic compile `sims_T = dot(store_tile [rt,D], q [T,D])` with
    sublane-group reductions reshape (rt,T)->(rt/8,8,T) -> max(axis=1)?
(b) Is the swapped-operand Mosaic bf16 dot BITWISE equal to the oracle's
    XLA HIGHEST matmul (transposed)?  This decides whether the 768-d
    two-level pipeline can use the transposed kernel form.
(c) Timing of the bm2 transposed pass on 1M x 768 at T=512.
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


def timeit(label, fn, *args, iters=4):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:>52s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


def _bm2t_kernel(limit_ref, q_ref, s_ref, sims_ref, bm8_ref, bm128_ref):
    sims_t = jax.lax.dot_general(
        s_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rt, T]
    rt, t = sims_t.shape
    row0 = pl.program_id(0) * rt
    local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
    sims_t = jnp.where(local < limit_ref[0], sims_t, PAD_SIM)
    sims_ref[:] = sims_t
    bm8 = jnp.max(sims_t.reshape(rt // 8, 8, t), axis=1)
    bm8_ref[:] = bm8
    bm128_ref[:] = jnp.max(bm8.reshape(rt // 128, 16, t), axis=1)


@functools.partial(jax.jit, static_argnames=("rt", "emit_sims"))
def bm2t_pass(queries, shard, valid_rows, rt=1024, emit_sims=True):
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
            pl.BlockSpec((rt // 8, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt // 128, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _bm2t_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r, t), jnp.float32),
            jax.ShapeDtypeStruct((r // 8, t), jnp.float32),
            jax.ShapeDtypeStruct((r // 128, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + (r // 8) * t * 4,
            transcendentals=0,
        ),
    )(limit, queries, shard)


def _bm2t_only_kernel(limit_ref, q_ref, s_ref, bm8_ref, bm128_ref):
    sims_t = jax.lax.dot_general(
        s_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rt, t = sims_t.shape
    row0 = pl.program_id(0) * rt
    local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
    sims_t = jnp.where(local < limit_ref[0], sims_t, PAD_SIM)
    bm8 = jnp.max(sims_t.reshape(rt // 8, 8, t), axis=1)
    bm8_ref[:] = bm8
    bm128_ref[:] = jnp.max(bm8.reshape(rt // 128, 16, t), axis=1)


@functools.partial(jax.jit, static_argnames=("rt",))
def bm2t_only(queries, shard, valid_rows, rt=1024):
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
            pl.BlockSpec((rt // 8, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt // 128, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _bm2t_only_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r // 8, t), jnp.float32),
            jax.ShapeDtypeStruct((r // 128, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + (r // 8) * t * 4,
            transcendentals=0,
        ),
    )(limit, queries, shard)


def main():
    D, T = 768, 512
    # small case for bitwise check
    Rs = 16384
    data_s = jax.random.normal(jax.random.PRNGKey(0), (Rs, D), dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=jnp.bfloat16)
    _force(data_s); _force(q)

    try:
        sims_t, bm8, bm128 = bm2t_pass(q, data_s, Rs, rt=1024)
        sims_t = jax.device_get(sims_t)
        bm8 = jax.device_get(bm8)
        bm128 = jax.device_get(bm128)
        print("compile: OK", flush=True)
    except Exception as e:
        print(f"compile FAILED: {str(e)[:400]}", flush=True)
        return

    oracle = jax.device_get(jax.jit(lambda qq, dd: jnp.dot(
        qq, dd.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST))(q, data_s))
    bitwise = np.array_equal(sims_t.T, oracle)
    print(f"swapped-operand dot bitwise == XLA HIGHEST: {bitwise}", flush=True)
    if not bitwise:
        d_ = np.abs(sims_t.T - oracle)
        print(f"  max abs err {d_.max():.3e} at "
              f"{np.unravel_index(d_.argmax(), d_.shape)}", flush=True)
    # bm correctness
    ok8 = np.array_equal(bm8, sims_t.reshape(Rs // 8, 8, T).max(axis=1))
    ok128 = np.array_equal(bm128, bm8.reshape(Rs // 128, 16, T).max(axis=1))
    print(f"bm8/bm128 reductions correct: {ok8}/{ok128}", flush=True)

    # timing on 1M
    R = 1_048_576
    data = jax.random.normal(jax.random.PRNGKey(2), (R, D), dtype=jnp.bfloat16)
    _force(data)
    for rt in (1024, 2048):
        try:
            timeit(f"bm2t-only pass 1Mx768 T={T} rt={rt}",
                   lambda qq, dd: bm2t_only(qq, dd, R, rt=rt), q, data)
        except Exception as e:
            print(f"rt={rt} FAILED: {str(e)[:200]}", flush=True)

    # compare: the existing non-transposed bm128-only kernel
    from better_search_rag_rust_tpu.ops.topk_pallas import matmul_blockmax_only
    timeit("existing bm128-only (non-transposed)",
           lambda qq, dd: matmul_blockmax_only(qq, dd, R), q, data)


if __name__ == "__main__":
    main()
