"""Prototype round 3: can DMA issue overlap MXU compute? (decides the
768-d extraction design)

Facts so far (v5e, relay): auto-pipelined gather of T*ks scattered
(16,768) units costs ~163 ns/DMA regardless of unit size (issue-bound).
The 1M x 768 extraction needs 53k DMAs/tile = 8.7 ms, serial after an
11.4 ms bm pass -> only ~31k q/s. If DMA issue runs on the scalar core
WHILE the MXU crunches, a fused kernel (bm matmul of tile i+1 + gather
of tile i) hides the whole gather.

Test A: V16 gather kernel + a resident-VMEM dummy matmul per step sized
like the bm pass share. If runtime ~= gather alone -> overlap works.
Test B: manual-DMA kernel with deeper pipelining (4 slots in flight)
to see if >2-deep buffering beats the auto pipeline's 163 ns/DMA.
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
    print(f"{label:>56s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


def _make_kernel(unit, cpg, mm_n):
    """Gather+rescore kernel; if mm_n > 0, also does a dummy resident
    matmul [8*?, D] x [D, mm_n] per step to emulate bm-pass MXU work."""

    def kernel(ids_ref, q_ref, mmq_ref, mms_ref, *refs):
        o_ref = refs[-1]
        mmo_ref = refs[-2]
        if mm_n > 0:
            acc = jax.lax.dot_general(
                mmq_ref[:], mms_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [TQ, mm_n]
            mmo_ref[:] = jnp.max(
                acc.reshape(acc.shape[0], mm_n // 128, 128), axis=2)
        for r in range(8):
            blocks = [refs[r * cpg + u][:] for u in range(cpg)]
            cat = jnp.concatenate(blocks, axis=0)
            s = jax.lax.dot_general(
                q_ref[:], cat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[r, :] = s[r, :]

    return kernel


def make_fused(t, d, ks, unit, cpg, mm_n, tq):
    def store_spec(r, u):
        return pl.BlockSpec(
            (unit, d),
            lambda g, j, ids_ref, r=r, u=u: (ids_ref[8 * g + r, j * cpg + u], 0),
            memory_space=pltpu.VMEM,
        )

    nsteps = (t // 8) * (ks // cpg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // 8, ks // cpg),
        in_specs=[
            pl.BlockSpec((8, d), lambda g, j, ids_ref: (g, 0),
                         memory_space=pltpu.VMEM),
            # dummy bm operands: resident, constant index
            pl.BlockSpec((tq, d), lambda g, j, ids_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(mm_n, 128), d), lambda g, j, ids_ref: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [store_spec(r, u) for r in range(8) for u in range(cpg)],
        out_specs=[
            pl.BlockSpec((tq, max(mm_n, 128) // 128),
                         lambda g, j, ids_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cpg * unit), lambda g, j, ids_ref: (g, j),
                         memory_space=pltpu.VMEM),
        ],
    )

    @jax.jit
    def run(ids, queries, mmq, mms, store):
        outs = pl.pallas_call(
            _make_kernel(unit, cpg, mm_n),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((tq, max(mm_n, 128) // 128), jnp.float32),
                jax.ShapeDtypeStruct((t, ks * unit), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * t * ks * unit * d + 2 * nsteps * tq * mm_n * d,
                bytes_accessed=t * ks * unit * d * 2,
                transcendentals=0,
            ),
        )(ids, queries, mmq, mms, *([store] * (8 * cpg)))
        return outs[1]

    return run


def main():
    rng = np.random.default_rng(2)
    R, D, ks, T, TQ = 1_048_576, 768, 104, 512, 512
    NU = R // 16
    data = jax.random.normal(jax.random.PRNGKey(3), (R, D), dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(4), (T, D), dtype=jnp.bfloat16)
    ids = jnp.asarray(np.sort(
        rng.integers(0, NU, size=(T, ks), dtype=np.int32), axis=1))
    _force(data); _force(q); _force(ids)
    print(f"== 1M x {D}, unit=16 cpg=8, T={T} ==", flush=True)

    # The real bm pass = 1.57e12/2 flops per T=512 tile over 832 steps
    # -> per step [512,768]x[768,mm_n]: mm_n s.t. 2*512*768*mm_n*832 ~ 0.79e12
    # -> mm_n ~ 1200; try 0 / 512 / 1280.
    for mm_n in (0, 512, 1280):
        mmq = q
        mms = jax.random.normal(jax.random.PRNGKey(5),
                                (max(mm_n, 128), D), dtype=jnp.bfloat16)
        _force(mms)
        try:
            fn = make_fused(T, D, ks, 16, 8, mm_n, TQ)
            label = (f"gather alone (mm_n=0)" if mm_n == 0
                     else f"gather + dummy matmul mm_n={mm_n}")
            extra = 2 * TQ * mm_n * D * (T // 8) * (ks // 8) / 1e12
            dt = timeit(label, fn, ids, q, mmq, mms, data)
            if mm_n:
                print(f"{'-> added MXU work':>56s}: {extra*1e3/197:9.2f} ms "
                      f"@peak ({extra:.2f} Tflop)", flush=True)
        except Exception as e:
            print(f"mm_n={mm_n} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
