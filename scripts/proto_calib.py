"""Calibrate relay overhead (fixed cost amortized over pipelined iters)
and re-measure the round-3 kernel candidates with it removed.

Model: measured(iters) = t_op + C/iters. Fit C from two iter counts on
one op, then report corrected times for all candidates.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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


def main():
    from proto_dma2 import make_v3
    from proto_bmt import bm2t_only
    from better_search_rag_rust_tpu.ops.topk_pallas import matmul_blockmax_only

    rng = np.random.default_rng(2)

    # -- calibration op: 1M x 768 bm2t pass --
    R2, D2, T = 1_048_576, 768, 512
    data2 = jax.random.normal(jax.random.PRNGKey(3), (R2, D2), dtype=jnp.bfloat16)
    q2 = jax.random.normal(jax.random.PRNGKey(4), (T, D2), dtype=jnp.bfloat16)
    _force(data2); _force(q2)

    fn = lambda qq, dd: bm2t_only(qq, dd, R2, rt=2048)
    t4 = raw_time(fn, q2, data2, iters=4)
    t16 = raw_time(fn, q2, data2, iters=16)
    t32 = raw_time(fn, q2, data2, iters=32)
    # t(i) = t_op + C/i  ->  C = (t4 - t16) / (1/4 - 1/16)
    C = (t4 - t16) / (1 / 4 - 1 / 16)
    t_op = t16 - C / 16
    print(f"bm2t: t4={t4*1e3:.2f} t16={t16*1e3:.2f} t32={t32*1e3:.2f} ms "
          f"-> overhead C={C*1e3:.1f} ms, t_op={t_op*1e3:.2f} ms", flush=True)

    def corrected(label, fn, *args, iters=24):
        t = raw_time(fn, *args, iters=iters)
        print(f"{label:>52s}: {(t - C/iters)*1e3:9.2f} ms "
              f"(raw {t*1e3:.2f} @ {iters})", flush=True)
        return t - C / iters

    # 768-d candidates
    NU2 = R2 // 16
    ks = 104
    ids2 = jnp.asarray(np.sort(
        rng.integers(0, NU2, size=(T, ks), dtype=np.int32), axis=1))
    _force(ids2)
    corrected("bm2t-only 1Mx768 T=512 rt=2048",
              lambda qq, dd: bm2t_only(qq, dd, R2, rt=2048), q2, data2)
    v16 = make_v3(T, D2, ks, 16, 8)
    corrected("V16 DMA gather unit=16 cpg=8 (T=512)", v16, ids2, q2, data2)
    v32 = make_v3(T, D2, 100, 32, 4)
    ids2b = jnp.asarray(np.sort(
        rng.integers(0, R2 // 32, size=(T, 100), dtype=np.int32), axis=1))
    _force(ids2b)
    corrected("V32 DMA gather unit=32 cpg=4 (T=512)", v32, ids2b, q2, data2)
    del data2

    # 10M x 256 candidates
    R, D, k = 10_027_008, 256, 100
    NB = R // 128
    data = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=jnp.bfloat16)
    ids = jnp.asarray(np.sort(
        rng.integers(0, NB, size=(T, k), dtype=np.int32), axis=1))
    _force(data); _force(q); _force(ids)

    corrected("bm128-only 10Mx256 T=512 rt=4096",
              lambda qq, dd: matmul_blockmax_only(qq, dd, R), q, data,
              iters=12)
    v3 = make_v3(T, D, k, 128, 4)
    corrected("V3 DMA gather unit=128 cpg=4 (T=512)", v3, ids, q, data,
              iters=12)
    # unit=16 at 256-d too (for a possible two-level 10M design)
    ids16 = jnp.asarray(np.sort(
        rng.integers(0, R // 16, size=(T, ks), dtype=np.int32), axis=1))
    _force(ids16)
    v16b = make_v3(T, D, ks, 16, 8)
    corrected("V16 DMA gather unit=16 cpg=8 10Mx256", v16b, ids16, q, data,
              iters=12)

    # T=1024 SMEM feasibility for the gather
    q1k = jax.random.normal(jax.random.PRNGKey(5), (1024, D), dtype=jnp.bfloat16)
    ids1k = jnp.asarray(np.sort(
        rng.integers(0, NB, size=(1024, k), dtype=np.int32), axis=1))
    _force(q1k); _force(ids1k)
    try:
        v3b = make_v3(1024, D, k, 128, 4)
        corrected("V3 DMA gather T=1024 (SMEM check)", v3b, ids1k, q1k, data,
                  iters=8)
    except Exception as e:
        print(f"T=1024 gather FAILED: {str(e)[:200]}", flush=True)
    try:
        corrected("bm128-only 10Mx256 T=1024",
                  lambda qq, dd: matmul_blockmax_only(qq, dd, R), q1k, data,
                  iters=8)
    except Exception as e:
        print(f"T=1024 bm FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
