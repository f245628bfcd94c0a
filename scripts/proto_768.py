"""Prototype: two-level (bm8 + bm128) sims-free pipeline for 1M x 768.

Pipeline per batch (Q=1024, T=512, k=100):
  1. fused Pallas pass -> bm8_t [R/8, T] + bm128_t [R/128, T], sims discarded
  2. per tile: select kb=k blocks from bm128 (approx+cert), gather their
     bm8 (rescan of 256 MB), subselect ks=112 8-row units
  3. ONE whole-batch row-take of the selected units' store rows
     (source rescan paid once per batch, not per tile)
  4. block_scores rescore (bitwise == streaming matmul) + final top_k

Measures each stage + the end-to-end sum candidate.
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
    print(f"{label:>52s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


# -- stage 1: fused bm8 + bm128 pass ----------------------------------------


def _bm2_kernel(limit_ref, q_ref, s_ref, bm8_ref, bm128_ref):
    sims = jax.lax.dot_general(
        q_ref[:], s_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t, rt = sims.shape
    row0 = pl.program_id(0) * rt
    local = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, rt), 1)
    sims = jnp.where(local < limit_ref[0], sims, PAD_SIM)
    bm8 = jnp.max(sims.reshape(t, rt // 8, 8), axis=2)  # [T, rt/8]
    bm8_ref[:] = bm8.T
    bm128_ref[:] = jnp.max(bm8.reshape(t, rt // 128, 16), axis=2).T


@functools.partial(jax.jit, static_argnames=("rt",))
def bm2_pass(queries, shard, valid_rows, rt=1024):
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
        _bm2_kernel,
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
    R, D, k, ks, T, Q = 1_048_576, 768, 100, 112, 512, 1024
    NB, NU = R // 128, R // 8
    data = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    qs = jax.random.normal(jax.random.PRNGKey(1), (Q, D), dtype=jnp.bfloat16)
    _force(data); _force(qs)
    q = qs[:T]

    # rt: vmem = 2*rt*D*2 + 2*(rt/8)*T*4 + 2*(rt/128)*T*4 + T*D*2 + T*rt*4
    for rt in (2048, 1024, 512):
        vm = 2*rt*D*2 + 2*(rt//8)*T*4 + 2*(rt//128)*T*4 + T*D*2 + T*rt*4
        print(f"rt={rt}: vmem={vm/2**20:.1f} MiB", flush=True)

    dt_bm = None
    for rt in (2048, 1024):
        try:
            dt = timeit(f"bm2 pass T={T} rt={rt}",
                        lambda qq, dd: bm2_pass(qq, dd, R, rt=rt), q, data,
                        iters=4)
            if dt_bm is None or dt < dt_bm:
                dt_bm = dt
        except Exception as e:
            print(f"bm2 rt={rt} FAILED: {str(e)[:200]}", flush=True)

    bm8, bm128 = bm2_pass(q, data, R, rt=1024)
    bm8t, bm128t = bm8.T, bm128.T  # [T, NU], [T, NB]
    _force(bm8t); _force(bm128t)

    # -- stage 2: two-level select ------------------------------------------
    @jax.jit
    def select(b128, b8):
        _, bids = jax.lax.top_k(b128, k)  # [T, k] (approx+cert later)
        bids = jnp.sort(bids, axis=1)
        cand8 = jnp.take_along_axis(
            b8.reshape(T, NB, 16), bids[:, :, None], axis=1
        ).reshape(T, k * 16)
        cand_uids = (bids[:, :, None] * 16
                     + jnp.arange(16, dtype=jnp.int32)[None, None, :]
                     ).reshape(T, k * 16)
        _, pos = jax.lax.top_k(cand8, ks)
        uids = jnp.take_along_axis(cand_uids, pos, axis=1)
        return jnp.sort(uids, axis=1)  # [T, ks] ascending 8-row unit ids

    dt_sel = timeit("two-level select (per tile)", select, bm128t, bm8t)
    uids = select(bm128t, bm8t)
    _force(uids)

    # -- stage 3+4: whole-batch take + rescore + final -------------------------
    from better_search_rag_rust_tpu.ops.topk_pallas import block_scores

    uids_batch = jnp.concatenate([uids, uids], axis=0)  # fake Q=1024
    _force(uids_batch)

    @jax.jit
    def extract(dd, qq, uu):
        rows = (uu[:, :, None] * 8
                + jnp.arange(8, dtype=jnp.int32)[None, None, :]
                ).reshape(Q, ks * 8)
        g = jnp.take(dd, rows.reshape(-1), axis=0).reshape(Q, ks * 8, D)
        sims = block_scores(qq, g, interpret=False)
        tv, tp = jax.lax.top_k(sims, k)
        return tv, jnp.take_along_axis(rows, tp, axis=1)

    dt_ex = timeit("batch row-take + rescore + final (Q=1024)",
                   extract, data, qs, uids_batch, iters=4)

    # also: per-tile take for comparison
    @jax.jit
    def extract_tile(dd, qq, uu):
        rows = (uu[:, :, None] * 8
                + jnp.arange(8, dtype=jnp.int32)[None, None, :]
                ).reshape(T, ks * 8)
        g = jnp.take(dd, rows.reshape(-1), axis=0).reshape(T, ks * 8, D)
        sims = block_scores(qq, g, interpret=False)
        tv, tp = jax.lax.top_k(sims, k)
        return tv, jnp.take_along_axis(rows, tp, axis=1)

    dt_ex_t = timeit("per-tile take + rescore + final (T=512)",
                     extract_tile, data, q, uids, iters=4)

    # relaid [NU, 8*D] source variant
    blocks8 = data.reshape(NU, 8 * D)
    _force(blocks8)

    @jax.jit
    def extract_blocks(bb, qq, uu):
        g = jnp.take(bb, uu.reshape(-1), axis=0).reshape(Q, ks * 8, D)
        sims = block_scores(qq, g, interpret=False)
        rows = (uu[:, :, None] * 8
                + jnp.arange(8, dtype=jnp.int32)[None, None, :]
                ).reshape(Q, ks * 8)
        tv, tp = jax.lax.top_k(sims, k)
        return tv, jnp.take_along_axis(rows, tp, axis=1)

    dt_ex_b = timeit("batch blocks8-take + rescore + final (Q=1024)",
                     extract_blocks, blocks8, qs, uids_batch, iters=4)

    n_tiles = Q // T
    total = dt_bm * n_tiles + dt_sel * n_tiles + dt_ex
    print(f"\nestimated batch: bm {dt_bm*n_tiles*1e3:.1f} + sel "
          f"{dt_sel*n_tiles*1e3:.1f} + extract {dt_ex*1e3:.1f} "
          f"= {total*1e3:.1f} ms -> {Q/total:,.0f} q/s", flush=True)


if __name__ == "__main__":
    main()
