"""Fused rotary + attention Pallas kernel for the encoder serving path.

Chip decomposition of the nomic forward (scripts/proto_encbd.py, B=256,
S=512, v5e): the attention core costs ~9.7 ms/layer while its matmul
content is ~2 ms — the rest is the ``[B, H, S, S]`` logits/probs HBM
round-trips that XLA materializes between the QK^T einsum, the f32
softmax, and the AV einsum — plus ~1.1 ms/apply for rotary (whose
32-lane half-slices force relayouts).

This kernel removes all of it for the short-sequence serving shape
(S <= ~1024, the reference's fixed 512-token padding,
/root/reference/src/llm/hf.rs:242-259): one (batch, head) grid cell
holds the full [S, hd] q/k/v tiles and the [S, S] f32 logits in VMEM,
so the only HBM traffic is q/k/v in and the context out.

* Rotary rides as full-lane ops: ``x*cos2 + roll(x, hd/2)*s2`` with
  ``cos2 = [cos, cos]`` and ``s2 = [-sin, sin]`` precomputed [S, hd] —
  no sub-128-lane slicing, no separate HBM round-trip for q/k.
* Softmax reduces in f32 in VMEM; normalization is applied to the
  [S, hd] context instead of the [S, S] probs (8x fewer divides; the
  unnormalized exp weights are cast bf16 for the MXU AV dot exactly
  like the XLA path casts its normalized probs).
* Key padding arrives as an additive f32 bias row [B, S] (same
  convention as the XLA paths in models/nomic.py); padded QUERY rows
  produce finite garbage that mean-pooling masks out downstream.

Numerics: logits accumulate f32 on the MXU (preferred_element_type) —
the variant sits between ``xla`` (f32 logits in HBM) and ``xla_bf16``
(bf16 logits); embedding cosine vs either is > 0.999. The encoder
records ``attention_impl`` in store/snapshot metadata, so mixing
variants across ingest/serve warns loudly (store/vectorstore.py
encoder-meta check).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rotary_roll_tables(cos, sin) -> Tuple[jax.Array, jax.Array]:
    """[S, hd/2] cos/sin -> full-lane [S, hd] (cos2, s2) tables for the
    roll-formulation: rot(x) = x*cos2 + roll(x, hd/2, lanes)*s2.

    Position j < hd/2 computes x1*cos - x2*sin (roll brings x2 there),
    j >= hd/2 computes x2*cos + x1*sin — exactly NeoX rotate-halves
    (models/nomic.py apply_rotary). This is the ONLY definition of the
    roll convention — the backward kernel's rotary adjoint
    (dx = g*cos2 + roll(g*s2)) is proven against exactly this sign
    layout, so every caller (model, tests, protos) must come through
    here."""
    cos2 = jnp.concatenate([cos, cos], axis=-1)
    s2 = jnp.concatenate([-sin, sin], axis=-1)
    return cos2, s2


def _attn_kernel(cos_ref, sin_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                 *, scale: float, hd2: int):
    v = v_ref[0, 0]
    c = cos_ref[...]                                  # [S, hd] f32
    s = sin_ref[...]
    # Rotary in f32: Mosaic's lane rotate is 32-bit-only ("Rotate with
    # non-32-bit data" on bf16), and the f32 VPU cost on [S, hd] is noise.
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    q = (q * c + pltpu.roll(q, hd2, 1) * s).astype(v.dtype)
    k = (k * c + pltpu.roll(k, hd2, 1) * s).astype(v.dtype)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # [S, S] f32
    # bias is VMEM-resident whole ([B, S] f32 — a (1, S) block violates
    # the (8, 128)-divisibility rule); the row is a dynamic sublane read.
    bias = bias_ref[pl.program_id(0)][None, :]
    logits = logits * scale + bias
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=1, keepdims=True)         # [S, 1] f32
    ctx = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # [S, hd] f32
    o_ref[0, 0] = (ctx / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret")
)
def fused_attention(
    q: jax.Array,          # [B, H, S, hd] bf16 (pre-rotary)
    k: jax.Array,          # [B, H, S, hd]
    v: jax.Array,          # [B, H, S, hd]
    cos2: jax.Array,       # [S, hd] f32 (rotary_roll_tables)
    s2: jax.Array,         # [S, hd] f32
    bias: jax.Array,       # [B, S] f32 additive key-padding bias
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Fused rotary+softmax attention; returns context [B, H, S, hd].

    Head-major variant, kept for the measurement record and as the
    starting point for a head-sharded (TP) port: with the XLA transposes
    its callers need it measured a complete NO-WIN vs the xla_bf16 chain
    (13.3 vs 13.5 ms/layer — scripts/proto_attn.py); the production path
    is :func:`fused_attention_qkv`, which takes the Wqkv layout as-is."""
    b, h, s, hd = q.shape
    if s % 8 or hd % 8:
        raise ValueError(f"bad attention tile [{s}, {hd}]")
    kern = functools.partial(_attn_kernel, scale=scale, hd2=hd // 2)
    return pl.pallas_call(
        kern,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((s, hd), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, hd), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s, hd), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, hd), q.dtype),
        interpret=interpret,
    )(cos2, s2, q, k, v, bias)


def _attn_qkv_kernel(cos_ref, sin_ref, qkv_ref, bias_ref, o_ref,
                     *, scale: float, heads: int, hd: int):
    qkv = qkv_ref[0]                                  # [S, 3*H*hd] bf16
    c = cos_ref[...]                                  # [S, hd] f32
    s = sin_ref[...]
    # bias is VMEM-resident whole ([B, S] f32); dynamic sublane read.
    bias = bias_ref[pl.program_id(0)][None, :]        # [1, S] f32
    hd2 = hd // 2
    outs = []
    for h in range(heads):
        # The qkv Dense emits [S, 3, H, hd] flattened: q/k/v for head h
        # sit at static 64-lane offsets — no transpose anywhere.
        q = qkv[:, (0 * heads + h) * hd:(0 * heads + h + 1) * hd]
        k = qkv[:, (1 * heads + h) * hd:(1 * heads + h + 1) * hd]
        v = qkv[:, (2 * heads + h) * hd:(2 * heads + h + 1) * hd]
        # f32 rotary: Mosaic's lane rotate is 32-bit-only.
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
        q = (q * c + pltpu.roll(q, hd2, 1) * s).astype(v.dtype)
        k = (k * c + pltpu.roll(k, hd2, 1) * s).astype(v.dtype)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits * scale + bias
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        ctx = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((ctx / denom).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)          # [S, H*hd]


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def fused_attention_qkv(
    qkv: jax.Array,        # [B, S, 3*H*hd] bf16 — the Wqkv output, as-is
    cos2: jax.Array,       # [S, hd] f32 (rotary_roll_tables)
    s2: jax.Array,         # [S, hd] f32
    bias: jax.Array,       # [B, S] f32 additive key-padding bias
    heads: int,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Fused rotary+attention straight off the Wqkv projection layout.

    Returns context [B, S, H*hd] (feeds out_proj directly). Zero
    transposes end to end: the per-head tiles are static 64-lane slices
    of the combined block held in VMEM."""
    b, s, three_hhd = qkv.shape
    hd = three_hhd // (3 * heads)
    if three_hhd % (3 * heads) or s % 8:
        raise ValueError(f"bad qkv shape {qkv.shape} for {heads} heads")
    kern = functools.partial(_attn_qkv_kernel, scale=scale, heads=heads,
                             hd=hd)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((s, hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, three_hhd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, heads * hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, heads * hd), qkv.dtype),
        interpret=interpret,
    )(cos2, s2, qkv, bias)


def _attn_qkv_bwd_kernel(cos_ref, sin_ref, q_ref, k_ref, v_ref, bias_ref,
                         g_ref, dq_ref, dk_ref, dv_ref, *, scale: float,
                         hd: int, hpb: int):
    """Flash-style backward for ONE (batch, head-block) grid cell:
    recompute the softmax in VMEM (no residuals beyond the forward's own
    inputs), then the standard dv = Pᵀg, dP = g vᵀ, dlogits =
    P∘(dP − rowsum(dP∘P)) chain per head, with the rotary adjoint
    dx = g*cos2 + roll(g*s2, hd/2) (rotation is orthogonal and the
    half-width roll is an involution).

    The head-blocked grid is a real-hardware constraint, not a style
    choice: the original whole-batch-element variant (12-head Python
    loop + one concat of all 36 per-head grads) kept every head's f32
    temporaries live at the concat and blew Mosaic's 16 MB scoped-VMEM
    limit (26.1 MB at B=64/S=512 — caught by the FIRST real-chip
    backward ever run, the r05 finetune battery suite; CPU interpret
    mode enforces no limit). ``hpb`` heads ride per grid step so the
    last block dim ``hd*hpb`` meets Mosaic's 128-lane divisibility
    (per-head hd=64 blocks are illegal); each head's grads store
    directly to its output slice — a 2-head working set is ~10 MB.
    Head math is unchanged, so per-shard values are bitwise identical
    to the old kernel's."""
    c = cos_ref[...]                                  # [S, hd] f32
    s = sin_ref[...]
    bias = bias_ref[pl.program_id(0)][None, :]        # [1, S] f32
    hd2 = hd // 2
    dt = dq_ref.dtype
    for h in range(hpb):
        sl = slice(h * hd, (h + 1) * hd)
        q0 = q_ref[0][:, sl]                          # [S, hd] bf16
        k0 = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        g = g_ref[0][:, sl]                           # [S, hd] bf16
        qf = q0.astype(jnp.float32)
        kf = k0.astype(jnp.float32)
        qr = (qf * c + pltpu.roll(qf, hd2, 1) * s).astype(v.dtype)
        kr = (kf * c + pltpu.roll(kf, hd2, 1) * s).astype(v.dtype)
        logits = jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)     # [S, S] f32
        pb = p.astype(v.dtype)
        dv = jax.lax.dot_general(                     # Pᵀ g -> [S, hd]
            pb, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(                     # g vᵀ -> [S, S]
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        row = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = (p * (dp - row) * scale).astype(v.dtype)
        dqr = jax.lax.dot_general(                    # ds k_rot -> [S, hd]
            ds, kr, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dkr = jax.lax.dot_general(                    # dsᵀ q_rot -> [S, hd]
            ds, qr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq0 = dqr * c + pltpu.roll(dqr * s, hd2, 1)
        dk0 = dkr * c + pltpu.roll(dkr * s, hd2, 1)
        dq_ref[0, :, sl] = dq0.astype(dt)
        dk_ref[0, :, sl] = dk0.astype(dt)
        dv_ref[0, :, sl] = dv.astype(dt)


def _fused_qkv_fwd(qkv, cos2, s2, bias, heads, scale, interpret):
    out = fused_attention_qkv(qkv, cos2, s2, bias, heads, scale,
                              interpret=interpret)
    return out, (qkv, cos2, s2, bias)


def _fused_qkv_bwd(heads, scale, interpret, res, dctx):
    qkv, cos2, s2, bias = res
    b, s, three_hhd = qkv.shape
    hd = three_hhd // (3 * heads)
    # Heads per grid step: the smallest count whose block width hd*hpb
    # meets Mosaic's 128-lane divisibility AND divides the head count so
    # q/k/v group boundaries align with block boundaries (hd=64 -> 2;
    # hd % 128 == 0 -> 1). Worst case hpb=heads: whole-head-axis blocks,
    # always lane-legal for hidden % 128 == 0 — still better than the
    # old kernel (grads store per head, no 36-array concat liveness).
    # Corner: hidden % 128 != 0 AND no smaller legal hpb exists only on
    # tiny test models; those run interpret-mode (CPU) where the lane
    # rule is not enforced — real-chip training shapes are hidden=768.
    hpb = heads
    for cand in range(1, heads + 1):
        if (hd * cand) % 128 == 0 and heads % cand == 0:
            hpb = cand
            break
    nhb = heads // hpb
    w = hd * hpb
    kern = functools.partial(_attn_qkv_bwd_kernel, scale=scale, hd=hd,
                             hpb=hpb)
    # One (batch, head-block) cell per grid step (see the kernel
    # docstring for why this is a scoped-VMEM requirement). The q/k/v/g
    # operands are (1, s, hd*hpb) views into the SAME qkv/dctx arrays —
    # block index j walks the head axis of the [q heads | k heads |
    # v heads] last-dim layout — and dq/dk/dv land in three [b, s, H*hd]
    # outputs whose concat reproduces that layout exactly.
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(b, nhb),
        in_specs=[
            pl.BlockSpec((s, hd), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, hd), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, w), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, w), lambda i, j: (i, 0, nhb + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, w), lambda i, j: (i, 0, 2 * nhb + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, s), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, w), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s, w), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, w), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, w), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, heads * hd), qkv.dtype)
            for _ in range(3)
        ],
        interpret=interpret,
    )(cos2, s2, qkv, qkv, qkv, bias, dctx.astype(qkv.dtype))
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    # Rotary tables and the key-padding bias carry no useful gradient for
    # this model (tables are constants; bias comes from the token mask).
    return (dqkv, jnp.zeros_like(cos2), jnp.zeros_like(s2),
            jnp.zeros_like(bias))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_attention_qkv_diff(qkv, cos2, s2, bias, heads, scale,
                             interpret=False):
    """Differentiable wrapper over :func:`fused_attention_qkv`: the same
    forward kernel plus a flash-style recompute backward kernel, so
    single-device finetuning can keep the fused serving path (the trainer
    still routes multi-device meshes to the XLA attention — a pallas_call
    does not partition under pjit)."""
    return fused_attention_qkv(qkv, cos2, s2, bias, heads, scale,
                               interpret=interpret)


fused_attention_qkv_diff.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)
