"""Pallas fused scoring kernel: tiled GEMM + block-max in one VMEM pass.

This is the BASELINE.json north-star kernel ("Pallas fused tiled-GEMM +
running-top-k kernel per chip"): the replacement for the reference's per-row
scalar cosine loop (reference: src/mpi_helpers/metrics.rs:36-44 calling
src/metrics.rs:143-165 once per row).

The dense two-stage selection (:func:`.topk.global_topk`) needs, per query
tile, (a) the f32 similarity row and (b) its per-row-block maxima. Pure XLA
computes the matmul into HBM and then *re-reads* the multi-GB similarity
buffer to reduce it — a lane-axis segmented max that XLA lays out poorly.
Here one kernel produces both in a single pass:

* grid over store row tiles; the query tile stays resident in VMEM;
* each step: ``[T, D] x [D, RT] -> [T, RT]`` f32 on the MXU (bf16 operands,
  f32 accumulation via ``preferred_element_type``);
* padding rows are masked to ``PAD_SIM`` in-register (scalar-prefetched
  valid-row limit), so a padded zero-row can never win a block slot;
* the block-max reduces the freshly computed tile **while it is still in
  VMEM**, so HBM sees one similarity write and zero re-reads;
* outputs: ``sims [T, R] f32`` (consumed by the candidate gather) and
  ``bm_t [R/block, T] f32`` (consumed by block selection; transposed so the
  output tile's lane dim is the full query-tile width, which Mosaic requires).

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

from .quantize import INT8_INV_SCALE2

#: Default row-block width for block-max (TPU lane width).
BLOCK = 128
#: Sentinel similarity for padded store rows (matches .topk.PAD_SIM).
PAD_SIM = -3.0


def _sims_dot(a: jax.Array, b: jax.Array, dims) -> jax.Array:
    """The ONE scoring contraction every kernel body uses, f32 out.

    float/bf16 operands: MXU dot with f32 accumulation (bitwise equal to
    XLA HIGHEST for bf16, chip-verified). int8 operands: EXACT int32 MXU
    dot, value-converted to f32 (exact below 2^24) and scaled by the
    shared :data:`..quantize.INT8_INV_SCALE2` constant — one f32 multiply,
    so the scaled score is bitwise identical across Mosaic/XLA/NumPy on
    every backend (chip-verified, scripts/proto_int8.py)."""
    if jnp.dtype(a.dtype) == jnp.int8:
        acc = jax.lax.dot_general(
            a, b, dimension_numbers=dims,
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * jnp.float32(INT8_INV_SCALE2)
    return jax.lax.dot_general(
        a, b, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )


def _pick_row_tile(
    rows: int, dim: int, q_tile: int, block: int, itemsize: int
) -> int:
    """Largest row tile dividing ``rows`` that keeps the working set (store
    tile + sims tile + query tile) under ~8 MB. The tile holds a whole
    multiple of 8 blocks so the transposed block-max output block keeps an
    8-aligned sublane dim. ``itemsize`` = operand dtype bytes."""
    step = 8 * block

    def vmem(rt: int) -> int:
        # Pallas double-buffers the streamed operands/outputs (store tile in,
        # sims tile out); the query tile is resident once. Measured: ignoring
        # the x2 overcommits VMEM and Mosaic compilation fails.
        return (
            2 * rt * dim * itemsize
            + 2 * q_tile * rt * 4
            + q_tile * dim * itemsize
        )

    for rt in (4 * step, 2 * step, step):
        if rows % rt:
            continue
        if vmem(rt) <= 12 * 1024 * 1024:
            return rt
    # Single-tile fallback (small shards): a block equal to the full array
    # dim is always layout-legal, whatever its alignment (and single-step
    # grids don't double-buffer).
    if vmem(rows) // 2 <= 12 * 1024 * 1024:
        return rows
    raise ValueError(
        f"no row tile divides rows={rows} "
        f"(dim={dim}, block={block}; caller must pad rows to 8*block)"
    )


def _make_kernel(block: int):
    def _mm_blockmax_kernel(limit_ref, q_ref, s_ref, sims_ref, bm_ref):
        """One row tile: fused MXU matmul + padding mask + VMEM block-max."""
        sims = _sims_dot(
            q_ref[:], s_ref[:], (((1,), (1,)), ((), ()))
        )  # [T, RT] f32, accumulated on the MXU
        t, rt = sims.shape
        row0 = pl.program_id(0) * rt
        local = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, rt), 1)
        sims = jnp.where(local < limit_ref[0], sims, PAD_SIM)
        sims_ref[:] = sims
        bm_ref[:] = jnp.max(sims.reshape(t, rt // block, block), axis=2).T

    return _mm_blockmax_kernel


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def matmul_blockmax(
    queries: jax.Array,
    shard: jax.Array,
    valid_rows: jax.Array,
    *,
    interpret: bool = False,
    block: int = BLOCK,
) -> Tuple[jax.Array, jax.Array]:
    """``(sims [T, R] f32, bm_t [R/block, T] f32)`` for ``queries [T, D]``
    against ``shard [R, D]`` (both typically bf16; accumulation is always
    f32). ``valid_rows`` (scalar int32) marks the shard-local valid-row
    count; rows beyond it score ``PAD_SIM``.

    ``R`` must be a multiple of ``8 * block`` and ``D`` a multiple of the
    lane width — both guaranteed by
    :class:`..store.device_store.DeviceStore` padding plus the local block
    rounding in :func:`.topk.global_topk`.
    """
    t, d = queries.shape
    r, d2 = shard.shape
    if d != d2:
        raise ValueError(f"dim mismatch {d} vs {d2}")
    if r % block:
        raise ValueError(f"rows {r} not a multiple of {block}")
    rt = _pick_row_tile(r, d, t, block, jnp.dtype(shard.dtype).itemsize)
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
                (rt // block, t), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
    )
    return pl.pallas_call(
        _make_kernel(block),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, r), jnp.float32),
            jax.ShapeDtypeStruct((r // block, t), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + t * r * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(limit, queries, shard)


def _make_bm_only_kernel(block: int):
    def _kernel(limit_ref, q_ref, s_ref, bm_ref):
        """One row tile: fused MXU matmul + padding mask + block-max, with
        the similarity tile DISCARDED after the reduce — no [T, R] HBM
        write at all (the 'rescore' pipeline recomputes candidate scores
        from gathered store rows instead)."""
        sims = _sims_dot(q_ref[:], s_ref[:], (((1,), (1,)), ((), ())))
        t, rt = sims.shape
        row0 = pl.program_id(0) * rt
        local = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, rt), 1)
        sims = jnp.where(local < limit_ref[0], sims, PAD_SIM)
        bm_ref[:] = jnp.max(sims.reshape(t, rt // block, block), axis=2).T

    return _kernel


def pick_bm_row_tile(rows: int, dim: int, q_tile: int, block: int,
                     itemsize: int) -> int:
    """Row tile for the bm-only kernel: the sims tile lives only in
    registers/VMEM scratch, so the budget is store tile + bm out + query
    tile. 4096 is the measured ceiling (8192 fails Mosaic's double-buffered
    VMEM accounting on a v5e)."""
    def vmem(rt: int) -> int:
        return (2 * rt * dim * itemsize
                + 2 * (rt // block) * q_tile * 4
                + q_tile * dim * itemsize
                + q_tile * rt * 4)  # the in-register sims tile

    for rt in (4096, 2048, 1024):
        if rows % rt:
            continue
        if vmem(rt) <= 12 * 1024 * 1024:
            return rt
    # Single-tile fallback (small shards) — single-step grids don't
    # double-buffer, but the budget still applies (a small-row/large-dim
    # shard must degrade to the XLA path, not fail Mosaic compilation).
    if rows % block == 0 and rows <= 4096 and vmem(rows) // 2 <= 12 * 1024 * 1024:
        return rows
    raise ValueError(
        f"no bm-only row tile divides rows={rows} (dim={dim}, q={q_tile})"
    )


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def matmul_blockmax_only(
    queries: jax.Array,
    shard: jax.Array,
    valid_rows: jax.Array,
    *,
    interpret: bool = False,
    block: int = BLOCK,
) -> jax.Array:
    """``bm_t [R/block, T] f32`` block maxima WITHOUT materializing the
    similarity matrix — one streaming pass over the shard at MXU speed
    (measured ~70% MXU on 10M x 256 at T=512). ``R`` must be a multiple of
    the row tile (pad with zero rows; they score ``PAD_SIM``)."""
    t, d = queries.shape
    r, d2 = shard.shape
    if d != d2:
        raise ValueError(f"dim mismatch {d} vs {d2}")
    rt = pick_bm_row_tile(r, d, t, block, jnp.dtype(shard.dtype).itemsize)
    limit = jnp.asarray(valid_rows, dtype=jnp.int32).reshape((1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // rt,),
        in_specs=[
            pl.BlockSpec((t, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (rt // block, t), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
    )
    (bm_t,) = pl.pallas_call(
        _make_bm_only_kernel(block),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((r // block, t), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2 + (r // block) * t * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(limit, queries, shard)
    return bm_t


def m2_sort_key(x: jax.Array) -> jax.Array:
    """Order-preserving int32 image of f32 ``x`` (-0.0 folded into +0.0):
    the standard sign-flip uint transform, shifted back into int32 range.
    ``x >= y  <=>  m2_sort_key(x) >= m2_sort_key(y)`` — integer
    comparisons, immune to the TPU denormal flush."""
    b = jax.lax.bitcast_convert_type(x + 0.0, jnp.uint32)
    mono = jnp.where(x < 0, ~b, b | jnp.uint32(0x80000000))
    return jax.lax.bitcast_convert_type(
        mono ^ jnp.uint32(0x80000000), jnp.int32)


def pack_m2_argmax_key(m2: jax.Array, arg: jax.Array) -> jax.Array:
    """Pack a unit's second max and argmax row into ONE int32 key.

    Layout: ``m2``'s monotone uint image rounded UP to the next 128
    boundary in the high 25 bits, ``arg`` in the low 7. The argmax is
    SUB-LOCAL (``arg < sub <= 128``), so 7 bits always suffice — round 7
    reclaimed the 9 bits the original 16-bit layout wasted on it, which
    shrinks the conservative rounding window 512x (2^17 -> 2^8 ulps,
    ~1e-3 -> ~2e-6 in sim units near a 1M x 768 selection boundary) and
    with it the spurious-danger rate of the argmax fast path. Guarantees,
    with ``K(x) = m2_sort_key(x)`` the exact key:

    * conservative: ``packed >= K(m2)`` — so ``m2 >= w`` implies
      ``packed >= K(w)`` (the danger test never misses a unit), and
      selecting the top ``gd`` units BY packed key covers every unit
      with ``packed >= K(w)`` whenever their count is within ``gd``;
    * tight: ``packed < K(m2) + 2^8`` (over-rounding admits only
      spurious danger units within 2 buckets of ``w``, never a miss);
    * exact recovery: ``packed & 0x7F == arg`` (the rounded image's
      low 7 bits are zero; XOR of the sign bit never touches them).
    """
    b = jax.lax.bitcast_convert_type(m2 + 0.0, jnp.uint32)
    mono = jnp.where(m2 < 0, ~b, b | jnp.uint32(0x80000000))
    key_u = ((mono + jnp.uint32(0x7F)) & jnp.uint32(0xFFFFFF80)) | (
        arg.astype(jnp.uint32))
    return jax.lax.bitcast_convert_type(
        key_u ^ jnp.uint32(0x80000000), jnp.int32)


def int8_packed_emission_ok(sub: int, dim: int) -> bool:
    """Whether the integer-domain packed emission applies: int8 scoring
    with a power-of-2 ``sub`` and the packed key ``acc * 128 + (127 -
    idx)`` free of int32 overflow (``|acc| <= 127^2 * dim``)."""
    return (sub & (sub - 1)) == 0 and 127 * 127 * dim * 128 + 127 < 2**31


#: Integer pad for the packed int8 emission: below any attainable int8
#: dot (|acc| <= 127^2 * 1040 under :func:`int8_packed_emission_ok`) and
#: ``* 128`` still in int32 range.
_PAD_ACC = -(1 << 24)


def _int8_bm2_emit(acc3: jax.Array, sub: int):
    """(bms, packed key) from EXACT int32 dots ``acc3 [ru, sub, t]``.

    The float emission costs ~3 sublane reduces + ~6 full-size selects —
    VPU work that hides under the bf16 dot but is EXPOSED at int8 MXU
    speed (chip-measured: 2.10 -> 2.56 ms per [512, 1M x 768] tile,
    8.0 -> 14.2 at 10M x 256). Integer scores collapse it: pack
    ``key = acc * 128 + (127 - idx)`` — monotone in (acc desc, idx asc),
    exactly invertible (``key >> 7 = acc``, ``127 - (key & 0x7F) =
    idx``) — then TWO native sublane max-reduces get max, lowest
    attaining index, and the max excluding that row: packed keys are
    unique within a unit, so masking the argmax ELEMENT by value
    equality is masking the argmax ROW. Two reduces + 4 elementwise
    passes replace the float path's three reduces + ~6 passes + iota.

    The scaled f32 outputs are recovered on the 128x-smaller [ru, t]
    results: ``f32(int) * INT8_INV_SCALE2`` is monotone, so
    ``max(f32(a_i) * s) == f32(max a_i) * s`` bitwise — the emitted bms
    match the float path's exactly. Where two DISTINCT int dots round to
    the same scaled f32 (possible only above ~2^23), the argmax may name
    a different row of the same scaled value than the float path; the
    danger rescue covers the tie (m2 equals the max there), so the final
    top-k is unchanged — exactness is over scaled scores, tie-broken by
    row id, and both rows enter the final sort.
    """
    ru, _, t = acc3.shape
    rev = 127 - jax.lax.broadcasted_iota(jnp.int32, (ru, sub, t), 1)
    key = acc3 * 128 + rev
    # Packed keys are UNIQUE within a unit (distinct idx bits), so the
    # argmax element can be masked by VALUE equality and both reductions
    # go through Mosaic's native sublane reduce — an explicit pairwise
    # tournament tree needs strided sublane slices (relayouts) at every
    # level and chip-measured barely faster than the float path.
    k1 = jnp.max(key, axis=1)
    m2k = jnp.max(
        jnp.where(key == k1[:, None, :], jnp.int32(-(2**31)), key), axis=1)
    m1i = k1 >> 7                      # exact: floor((acc*128 + r)/128)
    arg = 127 - (k1 & 0x7F)
    m2i = m2k >> 7                     # idx bits of the runner-up discarded
    scale = jnp.float32(INT8_INV_SCALE2)
    bms = jnp.where(m1i == _PAD_ACC, PAD_SIM,
                    m1i.astype(jnp.float32) * scale)
    m2f = jnp.where(m2i == _PAD_ACC, PAD_SIM,
                    m2i.astype(jnp.float32) * scale)
    return bms, pack_m2_argmax_key(m2f, arg)


def _make_bm2t_kernel(sub: int, block: int, emit_block: bool,
                      emit_argmax: bool = False, emit_width: int = 0):
    def _kernel(limit_ref, q_ref, s_ref, *out_refs):
        """One row tile, TRANSPOSED similarity: ``dot(store_tile [RT, D],
        q [T, D]) -> sims_t [RT, T]`` so row groups live on the SUBLANE
        axis, where Mosaic supports non-128 reshape splits — the lane-axis
        split ``(T, RT) -> (T, RT/sub, sub)`` does not compile for
        sub != 128. The swapped-operand Mosaic bf16 dot is bitwise equal
        to XLA's HIGHEST matmul (chip-verified), so the emitted maxima
        are exact attained maxima of the oracle's scores.

        With ``emit_argmax`` the pass also emits each unit's argmax row
        (lowest attaining index) and its second max (the max EXCLUDING
        the argmax row — equal to the max when the unit holds a duplicate
        maximum) PACKED into one int32 sort key
        (:func:`pack_m2_argmax_key`): m2's order-preserving uint image
        rounded UP to a 128 boundary in the high 25 bits, the sub-local
        argmax in the low 7. One [RT/sub, T] output instead of two halves the
        refine-source traffic the host-side fast path must rescan. The
        extra VPU reductions hide under the MXU dot at bf16 (chip-measured:
        no pass-time change) but are EXPOSED at int8's 2x MXU rate — int8
        argmax emission takes the integer-domain packed tournament
        (:func:`_int8_bm2_emit`) instead."""
        if emit_argmax and jnp.dtype(s_ref.dtype) == jnp.int8 \
                and int8_packed_emission_ok(sub, s_ref.shape[1]):
            acc = jax.lax.dot_general(
                s_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [RT, T] exact integer dots
            rt, t = acc.shape
            row0 = pl.program_id(0) * rt
            local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
            acc = jnp.where(local < limit_ref[0], acc, _PAD_ACC)
            bms, key = _int8_bm2_emit(acc.reshape(rt // sub, sub, t), sub)
            out_refs[0][:] = bms
            out_refs[1][:] = key
            if emit_block:
                ew = emit_width or block
                out_refs[2][:] = jnp.max(
                    bms.reshape(rt // ew, ew // sub, t), axis=1)
            return
        if jnp.dtype(s_ref.dtype) == jnp.int8 and not emit_argmax \
                and 127 * 127 * s_ref.shape[1] < 2 ** 24:
            # bms-only int8: mask + max-reduce in the INTEGER domain and
            # convert only the sub-reduced [RT/sub, T] result — the
            # full-width int->f32 convert+scale pass (~1.35 ms per 10M
            # tile of exposed VPU) disappears. Bitwise equal to the float
            # path: f32(int) is exact below 2^24 and monotone, so
            # ``f32(max acc) * s == max(f32(acc) * s)``; partially padded
            # units are safe (_PAD_ACC < any attainable dot).
            acc = jax.lax.dot_general(
                s_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [RT, T] exact integer dots
            rt, t = acc.shape
            row0 = pl.program_id(0) * rt
            local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
            acc = jnp.where(local < limit_ref[0], acc, _PAD_ACC)
            m1 = jnp.max(acc.reshape(rt // sub, sub, t), axis=1)
            bms = jnp.where(
                m1 == _PAD_ACC, PAD_SIM,
                m1.astype(jnp.float32) * jnp.float32(INT8_INV_SCALE2))
            out_refs[0][:] = bms
            if emit_block:
                ew = emit_width or block
                out_refs[1][:] = jnp.max(
                    bms.reshape(rt // ew, ew // sub, t), axis=1)
            return
        sims_t = _sims_dot(
            s_ref[:], q_ref[:], (((1,), (1,)), ((), ()))
        )  # [RT, T] f32
        rt, t = sims_t.shape
        row0 = pl.program_id(0) * rt
        local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
        sims_t = jnp.where(local < limit_ref[0], sims_t, PAD_SIM)
        sims3 = sims_t.reshape(rt // sub, sub, t)
        bms = jnp.max(sims3, axis=1)
        out_refs[0][:] = bms
        i = 1
        if emit_argmax:
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (rt // sub, sub, t), 1)
            eq = sims3 == bms[:, None, :]
            arg = jnp.min(jnp.where(eq, iota, sub), axis=1)
            masked = jnp.where(iota == arg[:, None, :], PAD_SIM, sims3)
            m2 = jnp.max(masked, axis=1)
            out_refs[i][:] = pack_m2_argmax_key(m2, arg)
            i += 1
        if emit_block:
            ew = emit_width or block
            out_refs[i][:] = jnp.max(
                bms.reshape(rt // ew, ew // sub, t), axis=1)

    return _kernel


def pick_bm2_row_tile(rows: int, dim: int, q_tile: int, sub: int,
                      block: int, itemsize: int,
                      extra_outs: int = 0) -> int:
    """Row tile for the transposed bm pass. Budget: double-buffered store
    tile + transposed bm_sub output (plus ``extra_outs`` same-shaped
    argmax/max2 outputs) + resident query tile + the in-register sims
    tile. The output tile ``(rt/sub, t)`` needs an 8-aligned sublane dim
    unless it spans the whole array (Mosaic block legality), hence
    ``rt >= 8 * sub`` for multi-tile grids."""
    def vmem(rt: int) -> int:
        return (2 * rt * dim * itemsize
                + 2 * (1 + extra_outs) * (rt // sub) * q_tile * 4
                + q_tile * dim * itemsize
                + q_tile * rt * 4)

    for rt in (2048, 1024, 512):
        if rows % rt or rt % block or rt < 8 * sub:
            continue
        if vmem(rt) <= 12 * 1024 * 1024:
            return rt
    # Single-tile fallback: a block equal to the full array dim is always
    # layout-legal (and single-step grids don't double-buffer).
    if rows % block == 0 and rows <= 4096 and vmem(rows) // 2 <= 12 * 1024 * 1024:
        return rows
    raise ValueError(
        f"no bm2 row tile divides rows={rows} (dim={dim}, q={q_tile},"
        f" sub={sub}, block={block})"
    )


def bm2_emits_block(rows: int, rt: int, block: int, q_tile: int) -> bool:
    """Whether the pass can ALSO emit the block-level maxima in-kernel:
    the ``(rt/block, t)`` output tile needs an 8-divisible sublane dim
    (or the full array) and a 128-divisible lane dim (or the full array)
    to be Mosaic-legal. When illegal the caller reduces bm_sub in XLA
    instead (one extra read of the already-small bm_sub)."""
    del q_tile  # the lane dim of the output tile always spans the array
    return (rt // block) % 8 == 0 or rt == rows


def bm2_emit_width(rows: int, rt: int, sub: int, block: int) -> int:
    """Widest Mosaic-legal emit width for the fused coarse-maxima output:
    the largest divisor of ``block`` (multiple of ``sub``, > ``sub``)
    whose ``(rt/ew, t)`` output tile keeps an 8-divisible sublane dim
    (or spans the whole array). 0 when none exists — the caller then
    reduces coarse maxima from bm_sub in XLA.

    At the 10M geometry (block=1024, rt=2048) the block level itself is
    illegal (rt/block = 2), but ew=256 is legal (rt/ew = 8) and cuts
    the host-side coarse reduce's source from the full [R/sub, T] array
    to a quarter of it."""
    ew = block
    while ew > sub:
        if ew % sub == 0 and ((rt // ew) % 8 == 0 or rt == rows):
            return ew
        ew //= 2
    return 0


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "sub", "block", "emit_block",
                     "emit_argmax", "emit_width"),
)
def matmul_blockmax2_only(
    queries: jax.Array,
    shard: jax.Array,
    valid_rows: jax.Array,
    *,
    interpret: bool = False,
    sub: int = 16,
    block: int = BLOCK,
    emit_block: bool = False,
    emit_argmax: bool = False,
    emit_width: int = 0,
):
    """Sub-block maxima ``bm_sub [R/sub, T]`` without materializing
    similarities: one streaming pass reduces each transposed sims tile to
    per-``sub``-row maxima in VMEM and discards it (~90% MXU at 768-d on
    a v5e). Feeds the two-level sims-free selection: blocks are selected
    from the per-``block`` maxima, refined to ``~k`` sub-units, then
    :func:`gather_rescore` fetches only ``~k * sub`` store rows per query.

    With ``emit_block`` (legal per :func:`bm2_emits_block`) the pass also
    emits ``bm [R/block, T]`` fused — saving the caller an XLA re-read of
    bm_sub (~0.7 ms per [512, 1M] tile) — and returns ``(bm_sub, bm)``;
    otherwise returns ``bm_sub`` alone and the caller reduces in XLA (max
    is order-independent, so both forms give identical exact maxima).

    With ``emit_argmax`` the pass additionally emits ``key [R/sub, T]``
    int32 — each unit's argmax row (lowest max-attaining, shard-local)
    and second max (the unit's max EXCLUDING that row) packed into one
    conservative sort key (:func:`pack_m2_argmax_key`) — the input of
    the sims-free argmax fast path (:func:`..topk.rescore_topk`).
    Output order: ``(bm_sub, [key,] [bm])``. Chip-measured: the extra
    VPU reductions hide under the MXU dot (no pass-time change), and one
    packed output instead of (arg, m2) halves the host-side refine
    traffic. (A SPLIT emission — int8 args + group-coarse danger keys,
    4x smaller uid-take source — was chip-measured a ~1 ms/tile LOSS at
    1M x 768 for both dtypes and reverted: the int8-source take lowers
    even worse than the int32 one, re-confirming the take is
    lowering-bound, not byte-bound; scripts/proto_r3_split.py.)

    ``R`` must be a multiple of the row tile and of ``block``; ``sub``
    must divide ``block``."""
    t, d = queries.shape
    r, d2 = shard.shape
    if d != d2:
        raise ValueError(f"dim mismatch {d} vs {d2}")
    if block % sub:
        raise ValueError(f"sub {sub} must divide block {block}")
    if emit_argmax and sub > 128:
        raise ValueError(
            f"emit_argmax packs the sub-local argmax into 7 bits; sub"
            f" {sub} > 128 does not fit (pack_m2_argmax_key)"
        )
    rt = pick_bm2_row_tile(r, d, t, sub, block,
                           jnp.dtype(shard.dtype).itemsize,
                           extra_outs=1 if emit_argmax else 0)
    ew = emit_width or block
    if emit_block and (block % ew or ew % sub or not (
            (rt // ew) % 8 == 0 or rt == r)):
        raise ValueError(
            f"emit_block illegal at rt={rt}, emit_width={ew} (sublane"
            f" {rt // ew} not 8-divisible); reduce bm_sub in XLA instead"
        )
    limit = jnp.asarray(valid_rows, dtype=jnp.int32).reshape((1,))
    out_specs = [
        pl.BlockSpec((rt // sub, t), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((r // sub, t), jnp.float32)]
    if emit_argmax:
        out_specs.append(
            pl.BlockSpec((rt // sub, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((r // sub, t), jnp.int32))
    if emit_block:
        out_specs.append(
            pl.BlockSpec((rt // ew, t), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((r // ew, t), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r // rt,),
        in_specs=[
            pl.BlockSpec((t, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        _make_bm2t_kernel(sub, block, emit_block, emit_argmax, ew),
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * d * r,
            bytes_accessed=t * d * 2 + r * d * 2
            + (1 + (1 if emit_argmax else 0)) * (r // sub) * t * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(limit, queries, shard)
    return tuple(out) if (emit_block or emit_argmax) else out[0]


def _make_gather_rescore_kernel(cpg: int):
    def _kernel(ids_ref, q_ref, *refs):
        """One (8-query group, candidate-slot group) cell: the Pallas
        pipeline has already DMA'd each query's ``cpg`` candidate units
        into VMEM (the BlockSpec index maps read the scalar-prefetched
        ids); concatenate them per query and run ONE rank-2 dot, keeping
        row r — bitwise identical to a 1-row matmul and hence to the
        streaming bm pass (same K accumulation order)."""
        o_ref = refs[-1]
        for r in range(8):
            if cpg == 1:
                cat = refs[r][:]
            else:
                cat = jnp.concatenate(
                    [refs[r * cpg + u][:] for u in range(cpg)], axis=0
                )
            s = _sims_dot(
                q_ref[:], cat, (((1,), (1,)), ((), ()))
            )  # [8, cpg*unit]
            o_ref[r, :] = s[r, :]

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret", "unit", "cpg"))
def gather_rescore(
    queries: jax.Array,
    shard: jax.Array,
    ids: jax.Array,
    *,
    unit: int = BLOCK,
    cpg: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Fused candidate gather + rescore: ``scores [T, KS*unit] f32`` of
    each query against its own ``KS`` selected ``unit``-row store blocks
    (``ids [T, KS]`` int32 block ids into ``shard [R, D]``).

    The round-2 rescore path gathered candidate rows with an XLA row-take
    (a full source rescan per call) into an HBM buffer that
    :func:`block_scores` then re-read. Here the candidate blocks are
    DMA'd STRAIGHT from the store in HBM by the Pallas pipeline itself —
    BlockSpec index maps may read the scalar-prefetched ids, so the
    double-buffered fetch of query g's candidate j happens while cell
    (g, j-1) computes. Traffic = exactly the candidate bytes, read once:
    no rescan, no intermediate buffer, no second read. (Measured v5e:
    ~2.2x over take+block_scores at 10M x 256, and it scales with
    candidate bytes instead of store size.)

    Constraints: ``T % 8 == 0``; ``KS % cpg == 0``; ``(cpg * unit) % 128
    == 0`` (output lane width); ``R % unit == 0``; every id in
    ``[0, R/unit)``. ``unit`` must be a multiple of the shard dtype's
    sublane tile (:func:`sublane_tile_for`: 16 for bf16, 32 for int8).
    Scores are bitwise equal to the streaming matmul's (same Mosaic dot
    pattern as :func:`block_scores`)."""
    t, d = queries.shape
    r, d2 = shard.shape
    t2, ks = ids.shape
    if d != d2 or t != t2:
        raise ValueError(
            f"shape mismatch: queries {queries.shape}, shard {shard.shape},"
            f" ids {ids.shape}"
        )
    if t % 8 or ks % cpg or (cpg * unit) % 128 or r % unit:
        raise ValueError(
            f"layout: need T%8==0 (got {t}), KS%cpg==0 (got {ks}%{cpg}),"
            f" cpg*unit%128==0 (got {cpg}*{unit}), R%unit==0 (got {r}%{unit})"
        )

    def store_spec(r_, u_):
        return pl.BlockSpec(
            (unit, d),
            lambda g, j, ids_ref, r_=r_, u_=u_: (
                ids_ref[8 * g + r_, j * cpg + u_], 0
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // 8, ks // cpg),
        in_specs=[
            pl.BlockSpec((8, d), lambda g, j, ids_ref: (g, 0),
                         memory_space=pltpu.VMEM),
        ] + [store_spec(r_, u_) for r_ in range(8) for u_ in range(cpg)],
        out_specs=[
            pl.BlockSpec((8, cpg * unit), lambda g, j, ids_ref: (g, j),
                         memory_space=pltpu.VMEM),
        ],
    )
    (out,) = pl.pallas_call(
        _make_gather_rescore_kernel(cpg),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t, ks * unit), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * ks * unit * d,
            bytes_accessed=t * d * 2 + t * ks * unit * d * 2
            + t * ks * unit * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids, queries, *([shard] * (8 * cpg)))
    return out


def _make_gather_rows_kernel(cpg: int, unit: int):
    def _kernel(ids_ref, *refs):
        o_ref = refs[-1]
        for r in range(8):
            for u in range(cpg):
                o_ref[r, u * unit:(u + 1) * unit, :] = refs[r * cpg + u][:]

    return _kernel


@functools.partial(jax.jit, static_argnames=("unit", "cpg", "interpret"))
def gather_rows(
    shard: jax.Array,
    ids: jax.Array,
    *,
    unit: int = 8,
    cpg: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Pure candidate-row gather: ``rows [T, KS*unit, D]`` of each query's
    ``KS`` selected ``unit``-row store blocks (``ids [T, KS]`` int32 block
    ids into ``shard [R, D]``) — :func:`gather_rescore` minus the dot.

    No arithmetic happens here: DMA is dtype-exact data movement, so the
    output rows are bit-for-bit store rows regardless of dtype or
    backend. The f32 certified-rescore path needs this: its candidate
    scores must come from XLA HIGHEST dots (the f32 oracle's arithmetic,
    which Mosaic cannot reproduce bitwise — ``pallas_scoring_exact_for``),
    so the kernel's job is only to compact each query's candidate rows
    into a dense buffer the XLA dot can read. An XLA row-take would
    rescan the full source per call (~source_bytes at ~310 GB/s — the
    recorded gather dead end); this pipeline moves exactly the candidate
    bytes.

    Constraints: ``T % 8 == 0``; ``KS % cpg == 0``; ``R % unit == 0``;
    ``unit`` a multiple of the dtype's sublane tile
    (:func:`sublane_tile_for`); every id in ``[0, R/unit)``."""
    r, d = shard.shape
    t, ks = ids.shape
    if t % 8 or ks % cpg or r % unit or unit % sublane_tile_for(shard.dtype):
        raise ValueError(
            f"layout: need T%8==0 (got {t}), KS%cpg==0 (got {ks}%{cpg}),"
            f" R%unit==0 (got {r}%{unit}), unit%sublane==0 (got {unit})"
        )

    def store_spec(r_, u_):
        return pl.BlockSpec(
            (unit, d),
            lambda g, j, ids_ref, r_=r_, u_=u_: (
                ids_ref[8 * g + r_, j * cpg + u_], 0
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // 8, ks // cpg),
        in_specs=[store_spec(r_, u_) for r_ in range(8) for u_ in range(cpg)],
        out_specs=[
            pl.BlockSpec((8, cpg * unit, d),
                         lambda g, j, ids_ref: (g, j, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    (out,) = pl.pallas_call(
        _make_gather_rows_kernel(cpg, unit),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t, ks * unit, d), shard.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * t * ks * unit * d
            * jnp.dtype(shard.dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids, *([shard] * (8 * cpg)))
    return out


def _pick_score_ctile(c: int, d: int, itemsize: int) -> int:
    """Largest candidate tile (multiple of 128 dividing ``c``) whose
    double-buffered 8-query block of rows fits ~8 MB of VMEM."""
    best = 128
    for g in range(1, c // 128 + 1):
        ct = 128 * g
        if c % ct:
            continue
        if 2 * 8 * ct * d * itemsize + 8 * ct * 4 <= 8 * 1024 * 1024:
            best = ct
    return best


def _score_kernel(q_ref, g_ref, o_ref):
    """Scores for an (8-query, candidate-tile) cell.

    Each of the 8 queries has its OWN candidate rows, so the step runs 8
    rank-2 ``dot_general``s — the SAME primitive the scoring kernels use —
    and keeps row ``r`` of the r-th product. A row of an MXU matmul is
    bitwise identical to a 1-row matmul (the K accumulation order is the
    same), so every kept score matches the streaming matmul bit for bit.
    (Mosaic rejects sub-8 sublane blocks and batched dot_general, hence
    this 8-way unrolled form.)"""
    for r in range(8):
        s = _sims_dot(
            q_ref[:], g_ref[r], (((1,), (1,)), ((), ()))
        )  # [8, ctile]; only row r corresponds to query r's candidates
        o_ref[r, :] = s[r, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_scores(
    queries: jax.Array, gathered: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """``[T, C] f32`` scores of each query against ITS OWN ``C`` gathered
    candidate rows (``gathered [T, C, D]``).

    Exists because a plain ``einsum('td,tcd->tc')`` lets XLA pick a
    different reduction order than the big scoring matmul (measured: index
    mismatches vs the oracle at near-ties on real TPUs, both dtypes); this
    kernel pins the same Mosaic dot_general the bm pass uses, which is
    bitwise-identical to XLA's HIGHEST-precision matmul for bf16 operands
    (verified on hardware across the chip exactness sweep)."""
    t, d = queries.shape
    t2, c, d2 = gathered.shape
    if (t, d) != (t2, d2):
        raise ValueError(f"shape mismatch {queries.shape} vs {gathered.shape}")
    if t % 8:
        raise ValueError(f"query tile {t} must be a multiple of 8")
    ctile = _pick_score_ctile(c, d, jnp.dtype(gathered.dtype).itemsize)
    grid_spec = pl.GridSpec(
        grid=(t // 8, c // ctile),
        in_specs=[
            pl.BlockSpec((8, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, ctile, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, ctile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _score_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * c * d,
            bytes_accessed=t * d * 2 + t * c * d * 2 + t * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, gathered)


def pallas_scoring_exact_for(dtype) -> bool:
    """Whether the Mosaic matmul path reproduces the oracle's scores
    bit-for-bit for this operand dtype on the current backend.

    int8: yes EVERYWHERE — the int32 dot is exact integer arithmetic, so
    the scaled f32 score is order- and backend-independent (chip-verified,
    scripts/proto_int8.py); this identity needs no hardware proof at all.
    bf16: yes (verified on hardware — all sims-path kernels matched the
    oracle across the chip exactness sweep). f32 on a REAL TPU: no — the
    Mosaic default lowers to a single bf16 pass (max abs error ~3e-1 vs
    XLA HIGHEST on [64,768]x[768,1024]!), and precision=HIGHEST still
    differs by ~2e-5, so f32 shards must route to the XLA kernels.
    Interpret mode (tests) computes exact f32 math and is fine."""
    if jnp.dtype(dtype) == jnp.int8:
        return True
    if jax.default_backend() != "tpu":
        return True
    return jnp.dtype(dtype) == jnp.bfloat16


def sublane_tile_for(dtype) -> int:
    """Mosaic's sublane tile for an operand dtype: 8 rows at 4 bytes,
    16 at 2, 32 at 1 — store-row block heights (gather units, row tiles)
    must be multiples of this."""
    return 32 // jnp.dtype(dtype).itemsize


def default_interpret() -> bool:
    """Interpreter mode everywhere except a real TPU backend."""
    return jax.default_backend() != "tpu"
