"""Chip prototype: int8 scored store.

Questions this answers on a real v5e:

(a) Does Mosaic compile the transposed bm pass with int8 operands —
    ``dot(store_tile [rt, D] s8, q [T, D] s8, preferred=int32)`` — and at
    what speed vs the known bf16 floor (4.37 ms per [512, 1M x 768] tile)?
    v5e peaks 394 TOPS int8 vs 197 TFLOPS bf16, so the compute-bound bm
    pass could halve.
(b) Is the in-kernel ``f32(intdot) * c`` (c = 1/scale^2) bitwise equal to
    the host oracle (numpy int32 matmul -> f32 -> * c)?  Integer products
    and sums stay below 2^24 for dim <= 1024 at |coord| <= 127, so every
    f32 value is exact and ANY accumulation order agrees — the exactness
    story is stronger than bf16's (no Mosaic-vs-XLA identity needed).
(c) XLA fallback: jnp.dot(int8, int8, preferred int32) — compiles/exact?
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


def raw_time(fn, *args, iters=8):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def calib(fn, *args):
    t4 = raw_time(fn, *args, iters=4)
    t16 = raw_time(fn, *args, iters=16)
    C = (t4 - t16) / (1 / 4 - 1 / 16)
    return t16 - C / 16, C


def _bm2t_kernel_i8(inv_scale2: float, sub: int):
    def _kernel(limit_ref, q_ref, s_ref, bms_ref):
        acc = jax.lax.dot_general(
            s_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [rt, T] int32, exact
        sims_t = acc.astype(jnp.float32) * inv_scale2
        rt, t = sims_t.shape
        row0 = pl.program_id(0) * rt
        local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
        sims_t = jnp.where(local < limit_ref[0], sims_t, PAD_SIM)
        bms_ref[:] = jnp.max(sims_t.reshape(rt // sub, sub, t), axis=1)

    return _kernel


@functools.partial(jax.jit, static_argnames=("rt", "sub", "inv_scale2"))
def bm2t_i8(queries, shard, valid_rows, rt=2048, sub=64, inv_scale2=1.0):
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
            pl.BlockSpec((rt // sub, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    (bms,) = pl.pallas_call(
        _bm2t_kernel_i8(inv_scale2, sub),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((r // sub, t), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d + r * d + (r // sub) * t * 4,
            transcendentals=0,
        ),
    )(limit, queries, shard)
    return bms


@jax.jit
def xla_i8_dot(q, s):
    return jnp.dot(q, s.T, preferred_element_type=jnp.int32)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(7)
    T, D = 512, 768
    scale = 700.0
    c = float(np.float32(1.0) / (np.float32(scale) * np.float32(scale)))

    # -- (b) exactness on a small store first (cheap upload + readback) ----
    small_r = 4096
    s_small = rng.integers(-127, 128, size=(small_r, D), dtype=np.int8)
    q_small = rng.integers(-127, 128, size=(T, D), dtype=np.int8)
    sd = jnp.asarray(s_small); qd = jnp.asarray(q_small)
    _force(sd); _force(qd)
    print("small arrays uploaded", flush=True)
    try:
        bms = bm2t_i8(qd, sd, small_r, rt=small_r, sub=64, inv_scale2=c)
        bms_h = np.asarray(jax.device_get(bms))  # [64, T]
        intdot = s_small.astype(np.int32) @ q_small.T.astype(np.int32)
        ref = intdot.astype(np.float32) * np.float32(c)
        ref_bms = ref.reshape(small_r // 64, 64, T).max(axis=1)
        exact = np.array_equal(bms_h, ref_bms)
        mx = float(np.abs(bms_h - ref_bms).max())
        print(f"(b) mosaic int8 bms bitwise == host oracle: {exact} "
              f"(max abs diff {mx:.3e})", flush=True)
        if not exact:
            return 1
    except Exception as e:
        print(f"(b) MOSAIC INT8 FAILED: {type(e).__name__}: "
              f"{str(e)[:800]}", flush=True)
        return 1

    # -- (c) XLA int8 dot correctness (fallback/oracle path) ---------------
    try:
        out = xla_i8_dot(qd, sd)
        out_h = np.asarray(jax.device_get(out[:8]))
        ok = np.array_equal(out_h, intdot.T[:8])
        print(f"(c) XLA int8 dot exact: {ok} (dtype {out_h.dtype})",
              flush=True)
    except Exception as e:
        print(f"(c) XLA int8 FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # -- (a) timing at 1M x 768 (content irrelevant) ------------------------
    R = 1_048_576
    s_big = rng.integers(-127, 128, size=(R, D), dtype=np.int8)
    s_bd = jnp.asarray(s_big)
    _force(s_bd)
    print("1M int8 store uploaded", flush=True)
    for rt in (2048, 4096):
        try:
            t_op, C = calib(
                lambda q, s: bm2t_i8(q, s, R, rt=rt, sub=64, inv_scale2=c),
                qd, s_bd)
            mxu = 2 * T * D * R / t_op / 394e12
            print(f"(a) int8 bm2t rt={rt}: {t_op*1e3:8.2f} ms "
                  f"({mxu*100:.0f}% of int8 peak; bf16 floor 4.37 ms) "
                  f"(C={C*1e3:.1f})", flush=True)
        except Exception as e:
            print(f"(a) int8 rt={rt} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
