"""Pallas fused scoring kernel: tiled GEMM + block-max in one VMEM pass.

This is the BASELINE.json north-star kernel ("Pallas fused tiled-GEMM +
running-top-k kernel per chip"): the replacement for the reference's per-row
scalar cosine loop (reference: src/mpi_helpers/metrics.rs:36-44 calling
src/metrics.rs:143-165 once per row).

The dense two-stage selection (:func:`.topk.global_topk`) needs, per query
tile, (a) the f32 similarity row and (b) its per-128-row-block maxima. Pure
XLA computes the matmul into HBM and then *re-reads* the 4 GB similarity
buffer to reduce it — a lane-axis segmented max that XLA lays out poorly.
Here one kernel produces both in a single pass:

* grid over store row tiles; the query tile stays resident in VMEM;
* each step: ``[T, D] x [D, RT] -> [T, RT]`` f32 on the MXU (bf16 operands,
  f32 accumulation via ``preferred_element_type``);
* the block-max reduces the freshly computed tile **while it is still in
  VMEM**, so HBM sees one similarity write and zero re-reads;
* outputs: ``sims [T, R] f32`` (consumed by the candidate gather) and
  ``bm [T, R/128] f32`` (consumed by block selection).

On non-TPU backends the kernel runs in interpreter mode, so the CPU test
mesh exercises the identical code path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128  # row-block width for block-max (TPU lane width)


def _pick_row_tile(rows: int, dim: int, q_tile: int) -> int:
    """Largest row tile in {1024, 512, 256, 128} dividing ``rows`` that keeps
    the working set (store tile + sims tile + query tile) under ~8 MB."""
    for rt in (1024, 512, 256, 128):
        if rows % rt:
            continue
        vmem = rt * dim * 2 + q_tile * rt * 4 + q_tile * dim * 2
        if vmem <= 8 * 1024 * 1024:
            return rt
    raise ValueError(f"no row tile divides rows={rows} (dim={dim})")


#: Sentinel similarity for padded store rows (matches .topk.PAD_SIM).
PAD_SIM = -3.0


def _mm_blockmax_kernel(limit_ref, q_ref, s_ref, sims_ref, bm_ref):
    """One row tile: fused MXU matmul + padding mask + VMEM block-max.

    ``limit_ref[0]`` is the number of *valid* rows in this shard; rows at or
    beyond it are store padding and are masked to ``PAD_SIM`` before the
    block-max so a padded zero-row can never win a block slot (zero vectors
    score 0.0, which would beat negative similarities)."""
    sims = jax.lax.dot_general(
        q_ref[:],
        s_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, RT] f32, accumulated on the MXU
    t, rt = sims.shape
    row0 = pl.program_id(0) * rt
    local = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, rt), 1)
    sims = jnp.where(local < limit_ref[0], sims, PAD_SIM)
    sims_ref[:] = sims
    # Block-max emitted transposed ([blocks, T]) so the output tile's lane
    # dimension is the full query-tile width — Mosaic requires the last dim
    # of a block to be 128-aligned or equal to the array dim.
    bm_ref[:] = jnp.max(sims.reshape(t, rt // BLOCK, BLOCK), axis=2).T


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_blockmax(
    queries: jax.Array,
    shard: jax.Array,
    valid_rows: jax.Array,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """``(sims [T, R] f32, bm_t [R/128, T] f32)`` for ``queries [T, D]`` against
    ``shard [R, D]`` (both typically bf16; accumulation is always f32).
    ``valid_rows`` (scalar int32) marks the shard-local valid-row count; rows
    beyond it score ``PAD_SIM``.

    ``R`` must be a multiple of 128 and ``D`` a multiple of the lane width —
    both guaranteed by :class:`..store.device_store.DeviceStore` padding.
    """
    t, d = queries.shape
    r, d2 = shard.shape
    if d != d2:
        raise ValueError(f"dim mismatch {d} vs {d2}")
    if r % BLOCK:
        raise ValueError(f"rows {r} not a multiple of {BLOCK}")
    rt = _pick_row_tile(r, d, t)
    limit = jnp.asarray(valid_rows, dtype=jnp.int32).reshape((1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // rt,),
        in_specs=[
            # Query tile: resident across the whole grid (index map constant).
            pl.BlockSpec((t, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, rt), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rt // BLOCK, t), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
    )
    return pl.pallas_call(
        _mm_blockmax_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, r), jnp.float32),
            jax.ShapeDtypeStruct((r // BLOCK, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + t * r * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(limit, queries, shard)


def default_interpret() -> bool:
    """Interpreter mode everywhere except a real TPU backend."""
    return jax.default_backend() != "tpu"
