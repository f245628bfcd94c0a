"""N-fit decomposition of search_10m_int8_mat256's tile: is the packed
argmax/m2 emission (VPU work ~ R*T, exposed at int8 MXU speed on the 1M
suite: 2.10 -> 2.56 ms) the 10M tile's missing ~10 ms?

Cells: ref = production rescore_topk (sub=128, block=1024, gd=4);
bm = the bm pass with prod emissions (argmax + ew coarse maxima);
bmno = same without the argmax emission. MXU floor at int8:
2*512*10.16M*256 / 394T = 6.9 ms.

Usage: python scripts/proto_int8_10m.py [n1=4] [n2=12] [rounds=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops.quantize import cast_rows_to
from better_search_rag_rust_tpu.ops.topk import rescore_topk
from better_search_rag_rust_tpu.ops.topk_pallas import (
    bm2_emit_width, matmul_blockmax2_only, pick_bm2_row_tile,
)

N1 = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N2 = int(sys.argv[2]) if len(sys.argv) > 2 else 12
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
K, Q = 100, 512
R, VALID, D = 10_158_080, 10_000_000, 256
SUB, BLOCK, GD = 128, 1024, 4


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


RT = pick_bm2_row_tile(R, D, Q, SUB, BLOCK, 1, extra_outs=1)
EW = bm2_emit_width(R, RT, SUB, BLOCK)


def bm(qq, sh, emit_argmax=True):
    return matmul_blockmax2_only(
        qq, sh, jnp.int32(VALID), sub=SUB, block=BLOCK,
        emit_block=bool(EW), emit_argmax=emit_argmax, emit_width=EW or BLOCK,
    )


def cell_ref(qq, sh):
    return rescore_topk(
        sh, qq, K, jnp.int32(0), VALID, q_tile=512, use_pallas=True,
        sub_block=SUB, block=BLOCK, cpg=4, argmax_fast=True, danger_units=GD,
    )


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

    cells = [("ref", jax.jit(cell_ref)),
             ("bm", jax.jit(lambda q, s: bm(q, s))),
             ("bmno", jax.jit(lambda q, s: bm(q, s, emit_argmax=False)))]
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
