"""N-fit isolation of the int8 argmax-emission cost INSIDE the bm kernel
(10M x 256 geometry, sub=128). Variants as local pallas kernels:

  v0  no argmax emission (bms + coarse maxima only)      — the floor
  v1  packed key + k1 max-reduce ONLY (no m2 mask/reduce) — is the m2
      half (compare+select+2nd reduce) the cost, or the pack itself?
  v2  production masked-unique-key emission (current _int8_bm2_emit)
  v3  packed key via ONE reduce, m2 from a reduce over key MINUS an
      elementwise indicator — no broadcast compare: m2k = max(key - 128 *
      (key == k1 broadcast)) is the same mask; instead try the
      subtract-free two-pass with the compare fused into the second
      reduce's operand. (kept = v2 if no time difference)

Usage: python scripts/proto_emit_var.py [n1=4] [n2=12] [rounds=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from better_search_rag_rust_tpu.ops.quantize import cast_rows_to
from better_search_rag_rust_tpu.ops.topk_pallas import (
    _PAD_ACC, PAD_SIM, _sims_dot, bm2_emit_width, matmul_blockmax2_only,
    pack_m2_argmax_key, pick_bm2_row_tile,
)
from better_search_rag_rust_tpu.ops.quantize import INT8_INV_SCALE2

N1 = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N2 = int(sys.argv[2]) if len(sys.argv) > 2 else 12
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
Q = 512
R, VALID, D = 10_158_080, 10_000_000, 256
SUB, BLOCK = 128, 1024


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


RT = pick_bm2_row_tile(R, D, Q, SUB, BLOCK, 1, extra_outs=1)
EW = bm2_emit_width(R, RT, SUB, BLOCK)
#: The t-variant's in-kernel transposes roughly double Mosaic's scoped
#: VMEM footprint (rt=2048 OOMs at 31.5M vs the 16M limit) — halve it.
RT_T = 1024


def make_kernel(mode):
    def _kernel(limit_ref, q_ref, s_ref, key_out, bms_out, bmi_out):
        acc = jax.lax.dot_general(
            s_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        rt, t = acc.shape
        row0 = pl.program_id(0) * rt
        local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
        acc = jnp.where(local < limit_ref[0], acc, _PAD_ACC)
        a3 = acc.reshape(rt // SUB, SUB, t)
        ru = rt // SUB
        rev = 127 - jax.lax.broadcasted_iota(jnp.int32, (ru, SUB, t), 1)
        key = a3 * 128 + rev
        if mode == "twolevel":
            # Per-8-row (native sublane tile) max p8 and second s8, then
            # unit-level combine on the 16x smaller group arrays: the
            # runner-up is either the winning group's second or another
            # group's max. Exact because packed keys are unique.
            g = key.reshape(rt // 8, 8, t)
            p8 = jnp.max(g, axis=1)
            s8 = jnp.max(
                jnp.where(g == p8[:, None, :], jnp.int32(-(2**31)), g),
                axis=1)
            pg = p8.reshape(ru, SUB // 8, t)
            sg = s8.reshape(ru, SUB // 8, t)
            k1 = jnp.max(pg, axis=1)
            cand = jnp.where(pg == k1[:, None, :], sg, pg)
            m2k = jnp.max(cand, axis=1)
            m2i = m2k >> 7
            arg = 127 - (k1 & 0x7F)
            m2f = jnp.where(m2i == _PAD_ACC, PAD_SIM,
                            m2i.astype(jnp.float32) * jnp.float32(
                                INT8_INV_SCALE2))
            key_out[:] = pack_m2_argmax_key(m2f, arg)
            m1i = k1 >> 7
            bms = jnp.where(m1i == _PAD_ACC, PAD_SIM,
                            m1i.astype(jnp.float32) * jnp.float32(
                                INT8_INV_SCALE2))
            bms_out[:] = bms
            bmi_out[:] = jnp.max(bms.reshape(rt // EW, EW // SUB, t), axis=1)
            return
        k1 = jnp.max(key, axis=1)
        if mode == "k1only":
            key_out[:] = k1
        else:
            m2k = jnp.max(
                jnp.where(key == k1[:, None, :], jnp.int32(-(2**31)), key),
                axis=1)
            m2i = m2k >> 7
            arg = 127 - (k1 & 0x7F)
            m2f = jnp.where(m2i == _PAD_ACC, PAD_SIM,
                            m2i.astype(jnp.float32) * jnp.float32(
                                INT8_INV_SCALE2))
            key_out[:] = pack_m2_argmax_key(m2f, arg)
        m1i = k1 >> 7
        bms = jnp.where(m1i == _PAD_ACC, PAD_SIM,
                        m1i.astype(jnp.float32) * jnp.float32(
                            INT8_INV_SCALE2))
        bms_out[:] = bms
        bmi_out[:] = jnp.max(bms.reshape(rt // EW, EW // SUB, t), axis=1)

    return _kernel


def make_tkernel(mode):
    """Transposed orientation: acc = q . s^T -> [t, rt]; a SUB-row unit
    is 128 consecutive LANES, so unit reduces are native lane reduces and
    the k1 broadcast is a native lane splat. The 128x-smaller emission
    arrays are transposed in-kernel back to the production [R/sub, T]
    layout (whose (RT/sub, Q) blocks are Mosaic-legal; the natural
    (Q, RT/sub) blocks are NOT — last dim 16 < 128)."""

    def _kernel(limit_ref, q_ref, s_ref, key_out, bms_out):
        acc = jax.lax.dot_general(
            q_ref[:], s_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [t, rt]
        t, rt = acc.shape
        row0 = pl.program_id(0) * rt
        local = row0 + jax.lax.broadcasted_iota(jnp.int32, (t, rt), 1)
        acc = jnp.where(local < limit_ref[0], acc, _PAD_ACC)
        a3 = acc.reshape(t, rt // SUB, SUB)
        rev = 127 - jax.lax.broadcasted_iota(
            jnp.int32, (t, rt // SUB, SUB), 2)
        key = a3 * 128 + rev
        k1 = jnp.max(key, axis=2)  # [t, ru] — native lane reduce
        if mode == "k1only":
            key_out[:] = k1.T
        else:
            m2k = jnp.max(
                jnp.where(key == k1[:, :, None], jnp.int32(-(2**31)), key),
                axis=2)
            m2i = m2k >> 7
            arg = 127 - (k1 & 0x7F)
            m2f = jnp.where(m2i == _PAD_ACC, PAD_SIM,
                            m2i.astype(jnp.float32) * jnp.float32(
                                INT8_INV_SCALE2))
            key_out[:] = pack_m2_argmax_key(m2f, arg).T
        m1i = k1 >> 7
        bms = jnp.where(m1i == _PAD_ACC, PAD_SIM,
                        m1i.astype(jnp.float32) * jnp.float32(
                            INT8_INV_SCALE2))
        bms_out[:] = bms.T

    return _kernel


def run_tvariant(mode):
    def fn(qq, sh):
        limit = jnp.int32(VALID).reshape((1,))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RT_T,),
            in_specs=[
                pl.BlockSpec((Q, D), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RT_T, D), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((RT_T // SUB, Q), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RT_T // SUB, Q), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        key, bms = pl.pallas_call(
            make_tkernel(mode),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((R // SUB, Q), jnp.int32),
                jax.ShapeDtypeStruct((R // SUB, Q), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * Q * D * R,
                bytes_accessed=Q * D + R * D + 2 * (R // SUB) * Q * 4,
                transcendentals=0,
            ),
        )(limit, qq, sh)
        # bmi in XLA from the emitted bms (the t-kernel's (RT_T/ew, Q)
        # block is sublane-illegal at RT_T=1024) — charge its cost to
        # this cell so the A/B stays total-system.
        bmi = jnp.max(bms.reshape(R // EW, EW // SUB, Q), axis=1)
        return key, bms, bmi

    return jax.jit(fn)


def run_variant(mode):
    def fn(qq, sh):
        limit = jnp.int32(VALID).reshape((1,))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // RT,),
            in_specs=[
                pl.BlockSpec((Q, D), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RT, D), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((RT // SUB, Q), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RT // SUB, Q), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RT // EW, Q), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        return pl.pallas_call(
            make_kernel(mode),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((R // SUB, Q), jnp.int32),
                jax.ShapeDtypeStruct((R // SUB, Q), jnp.float32),
                jax.ShapeDtypeStruct((R // EW, Q), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * Q * D * R,
                bytes_accessed=Q * D + R * D + 2 * (R // SUB) * Q * 4,
                transcendentals=0,
            ),
        )(limit, qq, sh)

    return jax.jit(fn)


def main():
    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (R, D), dtype=jnp.float32)
        norms = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        x = x / jnp.where(norms == 0.0, 1.0, norms)
        return cast_rows_to(x, "int8")

    store8 = gen(jax.random.PRNGKey(0))
    _force(store8)
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
    q8 = store8[sel]
    _force(q8)
    print(f"rt={RT} ew={EW}", flush=True)

    def bmno(qq, sh):
        return matmul_blockmax2_only(
            qq, sh, jnp.int32(VALID), sub=SUB, block=BLOCK,
            emit_block=bool(EW), emit_argmax=False, emit_width=EW or BLOCK,
        )

    cells = [("v0_noarg", jax.jit(bmno)),
             ("v2_masked", run_variant("masked")),
             ("v4t_k1only", run_tvariant("k1only")),
             ("v4t_masked", run_tvariant("masked"))]
    ref_out = cells[1][1](q8, store8)
    new_out = cells[3][1](q8, store8)
    for a, b, nm in zip(ref_out, new_out, ("key", "bms", "bmi")):
        same = bool(jnp.all(a == b))
        print(f"v4t identical to v2 [{nm}]: {same}", flush=True)
    for nm, fn in cells:
        _force(fn(q8, store8))
        print(f"{nm}: compiled", flush=True)

    def timed(fn, n):
        out = fn(q8, store8)
        _force(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(q8, store8)
        _force(out)
        return time.perf_counter() - t0

    fits = {n: [] for n, _ in cells}
    for rnd in range(ROUNDS):
        for nm, fn in cells:
            t1 = timed(fn, N1)
            t2 = timed(fn, N2)
            fits[nm].append((t2 - t1) / (N2 - N1))
        print(f"round {rnd} " +
              " ".join(f"{n}={fits[n][-1]*1e3:.2f}" for n, _ in cells),
              flush=True)
    print("medians: " + " ".join(
        f"{n}={np.median(fits[n])*1e3:.2f}ms" for n, _ in cells), flush=True)


if __name__ == "__main__":
    main()
