"""Prototype: two-level blockmax + fused gather-rescore (round 3).

Goal: break the sims-traffic ceiling on 1M x 768 (>=45k q/s) and the gather
wall on 10M x 256 (>=12k q/s) with ONE kernel family:

  pass 1: Pallas matmul -> sub-block maxima bmS [T, NSB] AND block maxima
          bm128 [NB, T]; sims stay in registers (nothing big written).
  select: top-k 128-blocks from bm128 (exact containment), gather their
          bmS groups, top-k SUB-blocks (same proof, level 2), sort asc.
  fused:  scalar-prefetched sub-block ids drive BlockSpec index maps; each
          grid step DMA-fetches 8*G candidate sub-blocks [S, D] straight
          from the ORIGINAL store and rescosres them with one MXU dot
          (bitwise == the streaming matmul: same K order, bf16 operands).
  final:  diagonal-extract, mask, top_k over [T, k*S].

Traffic per query: k*S*D*2 bytes (S=16: 2.5 MB at 768-d) instead of the
sims path's 2*R*4 (8 MB at 1M) or the old rescore's k*128*D*2*2 (39 MB).
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


def timeit(label, fn, *args, iters=8):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    _force(out)  # computed buffer: pure relay sync/readback latency
    sync = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0 - sync) / iters
    print(f"{label:>48s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


# ---------------------------------------------------------------------------
# Pass 1: two-level blockmax (bmS [T, NSB] + bm128 [NB, T]), sims discarded
# ---------------------------------------------------------------------------


def _bm2_kernel(S, limit_ref, q_ref, s_ref, bms_ref, bm_ref):
    # Swapped dot -> [rt, T]: sub-block maxima become SUBLANE-group
    # reductions and both outputs land in [blocks, T] layout with no
    # transpose (the lane-group reduce variant crashes Mosaic).
    sims = jax.lax.dot_general(
        s_ref[:], q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rt, t = sims.shape
    row0 = pl.program_id(0) * rt
    local = row0 + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
    sims = jnp.where(local < limit_ref[0], sims, PAD_SIM)
    bms = jnp.max(sims.reshape(rt // S, S, t), axis=1)  # [rt/S, T]
    bms_ref[:] = bms
    bm_ref[:] = jnp.max(bms.reshape(rt // 128, 128 // S, t), axis=1)


@functools.partial(jax.jit, static_argnames=("rt", "S"))
def bm2(queries, shard, valid_rows, rt=2048, S=16):
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
        functools.partial(_bm2_kernel, S),
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


# ---------------------------------------------------------------------------
# Fused gather-rescore: ids [T, k] (global S-sub-block ids, sorted asc per
# query) -> cross scores [k//G, T, 8*G*S] f32
# ---------------------------------------------------------------------------


def _make_fused_kernel(nq, G):
    def kernel(ids_ref, q_ref, *refs):
        del ids_ref
        cands = refs[: nq * G]
        o_ref = refs[nq * G]
        q = q_ref[:].astype(jnp.bfloat16)
        c = jnp.concatenate([cr[:] for cr in cands], axis=0)  # [nq*G*S, D]
        s = jax.lax.dot_general(
            q, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [nq, nq*G*S]
        o_ref[0] = s

    return kernel


@functools.partial(jax.jit, static_argnames=("S", "G"))
def fused_scores(queries_f32, shard, ids, S=16, G=1):
    """queries_f32 [T, D] (f32 storage of bf16 values), shard [R, D] bf16,
    ids [T, k] int32 global sub-block ids -> raw cross [k//G, T, 8*G*S]."""
    t, d = queries_f32.shape
    k = ids.shape[1]
    nq = 8
    in_specs = [
        pl.BlockSpec((nq, d), lambda i, j, ids: (i, 0),
                     memory_space=pltpu.VMEM)
    ]
    for g in range(G):
        for r in range(nq):
            in_specs.append(
                pl.BlockSpec(
                    (S, d),
                    (lambda rr, gg: lambda i, j, ids: (ids[i * nq + rr,
                                                           j * G + gg], 0))(r, g),
                    memory_space=pltpu.VMEM,
                )
            )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // nq, k // G),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, nq, nq * G * S), lambda i, j, ids: (j, i, 0),
                         memory_space=pltpu.VMEM)
        ],
    )
    (out,) = pl.pallas_call(
        _make_fused_kernel(nq, G),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((k // G, t, nq * G * S), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * k * nq * G * S * d // G // 1,
            bytes_accessed=t * k * S * d * 2 + k * t * nq * G * S * 4 // G,
            transcendentals=0,
        ),
    )(ids, queries_f32, shard, *([shard] * (nq * G - 1)))
    return out


@functools.partial(jax.jit, static_argnames=("S", "G"))
def extract_diag(cross, S=16, G=1):
    """[k//G, T, 8*G*S] cross -> [T, k*S] per-query candidate scores."""
    kg, t, _ = cross.shape
    nq = 8
    c6 = cross.reshape(kg, t // nq, nq, G, nq, S)
    res = jnp.einsum("juagas->jugas", c6)  # diag over the two query axes
    # res [k//G, T//8, G, 8, S] -> [T, k, S]
    res = res.transpose(1, 3, 0, 2, 4)  # [T//8, 8, k//G, G, S]
    return res.reshape(t, kg * G * S)


# ---------------------------------------------------------------------------
# Selection stack (XLA)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "S", "sup_w"))
def select_subblocks(bms_t, bm_t, k, S=16, sup_w=8):
    """bms_t [NSB, T], bm_t [NB, T] -> sorted global sub-block ids [T, k]."""
    bms = bms_t.T  # [T, NSB]
    bm = bm_t.T  # [T, NB]
    t, nb = bm.shape
    kb = min(k, nb)
    if nb >= 4 * sup_w * kb and nb % sup_w == 0:
        nsup = nb // sup_w
        b8 = jnp.max(bm.reshape(t, nsup, sup_w), axis=2)
        ks = min(kb, nsup)
        _, sup = jax.lax.top_k(b8, ks)
        sup = jnp.sort(sup, axis=1)
        cand_bm = jnp.take_along_axis(
            bm.reshape(t, nsup, sup_w), sup[:, :, None], axis=1
        ).reshape(t, ks * sup_w)
        cand_bids = (sup[:, :, None] * sup_w
                     + jnp.arange(sup_w, dtype=jnp.int32)[None, None, :]
                     ).reshape(t, ks * sup_w)
        _, pos = jax.lax.top_k(cand_bm, kb)
        bids = jnp.take_along_axis(cand_bids, pos, axis=1)
    else:
        _, bids = jax.lax.top_k(bm, kb)
    bids = jnp.sort(bids, axis=1)  # [T, kb] 128-blocks, asc

    # level 2: sub-blocks of the selected 128-blocks
    spb = 128 // S  # sub-blocks per block
    nsb = bms.shape[1]
    sub = jnp.take_along_axis(
        bms.reshape(t, nsb // spb, spb), bids[:, :, None], axis=1
    )  # [T, kb, spb]
    ksub = min(k, kb * spb)
    _, pos = jax.lax.top_k(sub.reshape(t, kb * spb), ksub)
    gsub = (jnp.take_along_axis(bids, pos // spb, axis=1) * spb
            + (pos % spb).astype(jnp.int32))
    return jnp.sort(gsub, axis=1)  # [T, ksub] global sub-block ids, asc


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "1m"
    if which == "1m":
        R, D = 1_000_448, 768  # padded to 1024 multiples below
        k = 100
        T = 512
        S_list = (16, 32)
    else:
        R, D = 10_027_008, 256
        k = 100
        T = 512
        S_list = (32, 128)

    Rpad = R + (-R) % 2048
    print(f"config {which}: R={R} Rpad={Rpad} D={D} T={T} k={k}", flush=True)

    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (Rpad, D), dtype=jnp.bfloat16)
    # zero out padding rows like the engine does
    data = data.at[R:].set(0)
    _force(data)
    q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=jnp.bfloat16)
    qf32 = q.astype(jnp.float32)
    _force(qf32)

    # reference: bm-only single level (round-2 kernel) for the same shapes
    from better_search_rag_rust_tpu.ops.topk_pallas import matmul_blockmax_only

    try:
        timeit("bm-only single-level (round 2)",
               lambda qq, dd: matmul_blockmax_only(qq, dd, R), q, data, iters=3)
    except Exception as e:
        print(f"bm-only FAILED: {str(e)[:200]}", flush=True)

    for S in S_list:
        ok_rt = None
        for rt in (1024, 2048):
            try:
                dt = timeit(f"bm2 two-level S={S} rt={rt}",
                            lambda qq, dd: bm2(qq, dd, R, rt=rt, S=S),
                            q, data, iters=3)
                ok_rt = rt
                break
            except Exception as e:
                print(f"bm2 S={S} rt={rt} FAILED: {str(e)[:300]}", flush=True)
        if ok_rt is None:
            continue
        rt = ok_rt

        bms, bm_t = bm2(q, data, R, rt=rt, S=S)
        _force(bms)
        timeit(f"select_subblocks S={S}",
               lambda a, b: select_subblocks(a, b, k, S=S), bms, bm_t)
        ids = select_subblocks(bms, bm_t, k, S=S)
        _force(ids)

        for G in (1, 2, 4):
            if k % G:
                continue
            try:
                timeit(f"fused_scores S={S} G={G}",
                       lambda qq, dd, ii: fused_scores(qq, dd, ii, S=S, G=G),
                       qf32, data, ids, iters=3)
                timeit(f"fused+extract S={S} G={G}",
                       lambda qq, dd, ii: extract_diag(
                           fused_scores(qq, dd, ii, S=S, G=G), S=S, G=G),
                       qf32, data, ids, iters=3)
            except Exception as e:
                print(f"fused S={S} G={G} FAILED: {str(e)[:300]}", flush=True)

        # -- end-to-end assembled --------------------------------------------
        G = 2 if k % 2 == 0 else 1

        @jax.jit
        def e2e(qq32, dd):
            qq = qq32.astype(jnp.bfloat16)
            bms_, bmt_ = bm2(qq, dd, R, rt=rt, S=S)
            ids_ = select_subblocks(bms_, bmt_, k, S=S)
            cross = fused_scores(qq32, dd, ids_, S=S, G=G)
            cand = extract_diag(cross, S=S, G=G)  # [T, k*S]
            rows = (ids_[:, :, None] * S
                    + jnp.arange(S, dtype=jnp.int32)[None, None, :]
                    ).reshape(T, k * S)
            cand = jnp.where(rows < R, cand, PAD_SIM)
            cid = jnp.where(rows < R, rows, jnp.iinfo(jnp.int32).max)
            tv, tp = jax.lax.top_k(cand, k)
            return tv, jnp.take_along_axis(cid, tp, axis=1)

        dt = timeit(f"E2E two-level fused S={S}", e2e, qf32, data, iters=3)
        print(f"   -> {T / dt:,.0f} q/s per tile pipeline", flush=True)

        # -- bitwise + recall check vs XLA HIGHEST oracle ---------------------
        tv, ti = jax.device_get(e2e(qf32, data))
        NCHK = 8192

        @jax.jit
        def oracle_sims(qq, dd):
            return jnp.dot(qq, dd.T, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        direct = np.asarray(jax.device_get(oracle_sims(q[:8], data[:NCHK])))
        bad = 0
        for t_ in range(8):
            for j in range(k):
                r_ = int(ti[t_, j])
                if r_ < NCHK and direct[t_, r_] != tv[t_, j]:
                    bad += 1
                    if bad < 4:
                        print(f"BITWISE MISMATCH t={t_} row={r_}: "
                              f"{direct[t_, r_]} vs {tv[t_, j]}", flush=True)
        print(f"S={S} bitwise vs XLA HIGHEST: {'OK' if bad == 0 else f'{bad} BAD'}",
              flush=True)

        # recall vs serial oracle on small prefix store
        SR = 131072
        dsm = data[:SR]
        sims_np = np.asarray(jax.device_get(oracle_sims(q, dsm)))
        order = np.argsort(-sims_np, axis=1, kind="stable")[:, :k]

        @jax.jit
        def e2e_small(qq32, dd):
            qq = qq32.astype(jnp.bfloat16)
            bms_, bmt_ = bm2(qq, dd, SR, rt=1024, S=S)
            ids_ = select_subblocks(bms_, bmt_, k, S=S)
            cross = fused_scores(qq32, dd, ids_, S=S, G=G)
            cand = extract_diag(cross, S=S, G=G)
            rows = (ids_[:, :, None] * S
                    + jnp.arange(S, dtype=jnp.int32)[None, None, :]
                    ).reshape(T, k * S)
            cand = jnp.where(rows < SR, cand, PAD_SIM)
            cid = jnp.where(rows < SR, rows, jnp.iinfo(jnp.int32).max)
            tv, tp = jax.lax.top_k(cand, k)
            return tv, jnp.take_along_axis(cid, tp, axis=1)

        _, ti_s = jax.device_get(e2e_small(qf32, dsm))
        match = float(np.mean(ti_s == order))
        print(f"S={S} exact-index match vs serial oracle ({SR} rows): {match}",
              flush=True)


if __name__ == "__main__":
    main()
