"""Prototype: FUSED gather+rescore Pallas kernel via scalar-prefetched
dynamic index maps.

The round-2 rescore pipeline pays the candidate gather three times over:
XLA's row-take rescans the whole blocks_flat source per query tile
(~source_bytes/310 GB/s), writes the gathered rows to HBM, and
block_scores re-reads them. Here the Pallas pipeline itself fetches each
candidate block STRAIGHT from the store in HBM (BlockSpec index maps may
read scalar-prefetched ids), double-buffered by the normal Pallas pipeline
machinery, and the scores come out without any intermediate HBM buffer:

  traffic = exactly the candidate bytes, read once.

Kernel A (unit = 128 rows, the 10M x 256 shape): grid (T/8, k); 8 in_specs
on the SAME store operand, spec r fetching block ids[8g+r, j]; per step 8
rank-2 dots keep row r of the r-th product (bitwise == block_scores ==
the streaming matmul).

Also measures the XLA take + block_scores baseline for the same ids.
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
    print(f"{label:>44s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


# ---------------------------------------------------------------------------
# Kernel A: pipelined in_spec gather+rescore, unit = 128 rows
# ---------------------------------------------------------------------------


def _gr_kernel(ids_ref, q_ref, *refs):
    # refs = (s0..s7, o_ref)
    o_ref = refs[-1]
    for r in range(8):
        s = jax.lax.dot_general(
            q_ref[:],
            refs[r][:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [8, 128]
        o_ref[r, :] = s[r, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rescore128(queries, store, ids, *, interpret=False):
    """queries [T, D] bf16, store [R, D] bf16 (R mult of 128), ids [T, K]
    int32 block ids -> scores [T, K*128] f32, bitwise == the streaming
    matmul for the gathered rows."""
    t, d = queries.shape
    _, k = ids.shape

    def store_spec(r):
        return pl.BlockSpec(
            (128, d),
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
    (out,) = pl.pallas_call(
        _gr_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t, k * 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * k * 128 * d,
            bytes_accessed=t * d * 2 + t * k * 128 * d * 2 + t * k * 128 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids, queries, *([store] * 8))
    return out


# ---------------------------------------------------------------------------
# Baseline: XLA take from blocks_flat + block_scores (the round-2 path)
# ---------------------------------------------------------------------------


def main():
    R, D, k = 10_027_008, 256, 100
    R = R - (R % 128)
    NB = R // 128
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (R, D), dtype=jnp.bfloat16)
    _force(data)
    print(f"store: {R}x{D} bf16 = {R*D*2/2**30:.2f} GiB, NB={NB}", flush=True)

    for T in (256, 512):
        q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=jnp.bfloat16)
        # realistic ids: per-query top-k blocks by blockmax would be clustered;
        # use random sorted ids (worst case for DMA locality)
        ids = np.sort(
            np.random.default_rng(2).integers(0, NB, size=(T, k), dtype=np.int32),
            axis=1,
        )
        ids_d = jnp.asarray(ids)
        _force(q); _force(ids_d)

        try:
            dt = timeit(
                f"fused DMA gather+rescore T={T}",
                lambda qq, dd, ii: gather_rescore128(qq, dd, ii),
                q, data, ids_d, iters=4,
            )
            gb = T * k * 128 * D * 2 / 2**30
            print(f"{'  -> effective bandwidth':>44s}: "
                  f"{gb / dt:9.1f} GiB/s ({gb:.2f} GiB)", flush=True)
        except Exception as e:
            print(f"fused kernel FAILED T={T}: {str(e)[:400]}", flush=True)
            continue

        # exactness: compare a few gathered scores vs direct matmul
        out = jax.device_get(gather_rescore128(q, data, ids_d))
        direct = jax.device_get(jax.jit(
            lambda qq, dd: jax.lax.dot_general(
                qq, dd, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        )(q[:8], data[:131072]))
        ok = True
        for t_ in range(8):
            for j_ in range(k):
                b = int(ids[t_, j_])
                if b * 128 + 128 <= 131072:
                    got = out[t_, j_ * 128:(j_ + 1) * 128]
                    want = direct[t_, b * 128:(b + 1) * 128]
                    if not np.array_equal(got, want):
                        ok = False
                        print(f"MISMATCH t={t_} j={j_} block={b}", flush=True)
                        break
            if not ok:
                break
        print(f"{'bitwise vs direct matmul':>44s}: {ok}", flush=True)

        # baseline: XLA take from pre-relaid blocks + block_scores kernel
        blocks_flat = data.reshape(NB, 128 * D)
        _force(blocks_flat)

        from better_search_rag_rust_tpu.ops.topk_pallas import block_scores

        @jax.jit
        def xla_take_rescore(qq, bf, ii):
            g = jnp.take(bf, ii.reshape(-1), axis=0)
            g = g.reshape(T, k * 128, D)
            return block_scores(qq, g, interpret=False)

        try:
            timeit(f"XLA take + block_scores T={T}",
                   xla_take_rescore, q, blocks_flat, ids_d, iters=4)
        except Exception as e:
            print(f"baseline FAILED: {str(e)[:200]}", flush=True)
        del blocks_flat


if __name__ == "__main__":
    main()
