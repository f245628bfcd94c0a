"""Prototype round 2: where does the fused DMA gather+rescore time go?

V1 (proto_dma_rescore): grid (T/8, k), 8 specs, 8 small dots -> 13.5 ms
at T=512 on 10M x 256 (2.1 us/step). Hypotheses: (a) per-step pipeline
overhead + 8 serial small-dot latencies; (b) DMA issue rate.

V0 isolates DMA: same specs, kernel only copies 8 rows (no MXU).
V3 amortizes steps: grid (T/8, k/8), 64 specs, per-query concat of 8
   blocks then ONE [8,D]x[D,1024] dot (keep row r) -> 8x fewer steps.
V16 is the 768-d shape: unit = 16 rows, 64 specs, per-query concat of
   8 units -> [128, D], one dot per query -> out (8, 128).
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
    print(f"{label:>52s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


# -- V0: DMA only (no compute) ------------------------------------------------


def _v0_kernel(ids_ref, q_ref, *refs):
    o_ref = refs[-1]
    for r in range(8):
        o_ref[r, :] = refs[r][0, :128].astype(jnp.float32)


# -- V1: 8 small dots ----------------------------------------------------------


def _v1_kernel(ids_ref, q_ref, *refs):
    o_ref = refs[-1]
    for r in range(8):
        s = jax.lax.dot_general(
            q_ref[:], refs[r][:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[r, :] = s[r, :]


def make_v01(kernel, t, d, k, unit=128):
    def store_spec(r):
        return pl.BlockSpec(
            (unit, d),
            lambda g, j, ids_ref, r=r: (ids_ref[8 * g + r, j], 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // 8, k),
        in_specs=[
            pl.BlockSpec((8, d), lambda g, j, ids_ref: (g, 0),
                         memory_space=pltpu.VMEM),
        ] + [store_spec(r) for r in range(8)],
        out_specs=[
            pl.BlockSpec((8, 128), lambda g, j, ids_ref: (g, j),
                         memory_space=pltpu.VMEM),
        ],
    )

    @jax.jit
    def run(ids, queries, store):
        (out,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((t, k * 128), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * t * k * unit * d,
                bytes_accessed=t * k * unit * d * 2,
                transcendentals=0,
            ),
        )(ids, queries, *([store] * 8))
        return out

    return run


# -- V3: 64 specs, concat per query, one big dot per query ---------------------


def _make_v3_kernel(unit, cpg):
    def kernel(ids_ref, q_ref, *refs):
        o_ref = refs[-1]
        for r in range(8):
            blocks = [refs[r * cpg + u][:] for u in range(cpg)]
            cat = jnp.concatenate(blocks, axis=0)  # [cpg*unit, D]
            s = jax.lax.dot_general(
                q_ref[:], cat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [8, cpg*unit]
            o_ref[r, :] = s[r, :]

    return kernel


def make_v3(t, d, ks, unit, cpg):
    """grid (t/8, ks/cpg); 8*cpg store specs; out block (8, cpg*unit)."""
    def store_spec(r, u):
        return pl.BlockSpec(
            (unit, d),
            lambda g, j, ids_ref, r=r, u=u: (ids_ref[8 * g + r, j * cpg + u], 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // 8, ks // cpg),
        in_specs=[
            pl.BlockSpec((8, d), lambda g, j, ids_ref: (g, 0),
                         memory_space=pltpu.VMEM),
        ] + [store_spec(r, u) for r in range(8) for u in range(cpg)],
        out_specs=[
            pl.BlockSpec((8, cpg * unit), lambda g, j, ids_ref: (g, j),
                         memory_space=pltpu.VMEM),
        ],
    )

    @jax.jit
    def run(ids, queries, store):
        (out,) = pl.pallas_call(
            _make_v3_kernel(unit, cpg),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((t, ks * unit), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * t * ks * unit * d,
                bytes_accessed=t * ks * unit * d * 2,
                transcendentals=0,
            ),
        )(ids, queries, *([store] * (8 * cpg)))
        return out

    return run


def main():
    rng = np.random.default_rng(2)

    # ---- 10M x 256, unit=128 ----
    R, D, k, T = 10_026_880, 256, 100, 512
    NB = R // 128
    data = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=jnp.bfloat16)
    ids = jnp.asarray(np.sort(
        rng.integers(0, NB, size=(T, k), dtype=np.int32), axis=1))
    _force(data); _force(q); _force(ids)
    print(f"== 10M x {D}, unit=128, T={T}, k={k} ==", flush=True)

    for label, fn in [
        ("V0 DMA-only 8 specs", make_v01(_v0_kernel, T, D, k)),
        ("V1 8 small dots (ref)", make_v01(_v1_kernel, T, D, k)),
    ]:
        try:
            dt = timeit(label, fn, ids, q, data)
            gb = T * k * 128 * D * 2 / 2**30
            print(f"{'-> eff bw':>52s}: {gb/dt:9.1f} GiB/s", flush=True)
        except Exception as e:
            print(f"{label} FAILED: {str(e)[:300]}", flush=True)

    # V3 with cpg=4 -> 32 specs, padded ks=100 (100%4==0)
    for cpg in (2, 4):
        if k % cpg:
            continue
        try:
            fn = make_v3(T, D, k, 128, cpg)
            dt = timeit(f"V3 concat cpg={cpg} ({8*cpg} specs)", fn, ids, q, data)
            gb = T * k * 128 * D * 2 / 2**30
            print(f"{'-> eff bw':>52s}: {gb/dt:9.1f} GiB/s", flush=True)
        except Exception as e:
            print(f"V3 cpg={cpg} FAILED: {str(e)[:300]}", flush=True)

    del data
    # ---- 1M x 768, unit=16 ----
    R2, D2, ks, T = 1_048_576, 768, 104, 512
    NU = R2 // 16
    data2 = jax.random.normal(jax.random.PRNGKey(3), (R2, D2), dtype=jnp.bfloat16)
    q2 = jax.random.normal(jax.random.PRNGKey(4), (T, D2), dtype=jnp.bfloat16)
    ids2 = jnp.asarray(np.sort(
        rng.integers(0, NU, size=(T, ks), dtype=np.int32), axis=1))
    _force(data2); _force(q2); _force(ids2)
    print(f"== 1M x {D2}, unit=16, T={T}, ks={ks} ==", flush=True)

    for cpg in (8, 4):
        try:
            fn = make_v3(T, D2, ks, 16, cpg)
            dt = timeit(f"V16 concat cpg={cpg} ({8*cpg} specs)", fn,
                        ids2, q2, data2)
            gb = T * ks * 16 * D2 * 2 / 2**30
            print(f"{'-> eff bw':>52s}: {gb/dt:9.1f} GiB/s "
                  f"({gb:.2f} GiB)", flush=True)
        except Exception as e:
            print(f"V16 cpg={cpg} FAILED: {str(e)[:300]}", flush=True)

    # exactness check for V16 cpg=8
    try:
        fn = make_v3(T, D2, ks, 16, 8)
        out = jax.device_get(fn(ids2, q2, data2))
        direct = jax.device_get(jax.jit(
            lambda qq, dd: jax.lax.dot_general(
                qq, dd, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        )(q2[:8], data2[:65536]))
        ids_h = np.asarray(ids2)
        ok = True
        for t_ in range(8):
            for j_ in range(ks):
                u = int(ids_h[t_, j_])
                if u * 16 + 16 <= 65536:
                    got = out[t_, j_ * 16:(j_ + 1) * 16]
                    want = direct[t_, u * 16:(u + 1) * 16]
                    if not np.array_equal(got, want):
                        ok = False
                        break
            if not ok:
                break
        print(f"{'V16 bitwise vs direct matmul':>52s}: {ok}", flush=True)
    except Exception as e:
        print(f"V16 exactness FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
