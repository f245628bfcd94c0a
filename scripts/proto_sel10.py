"""Composed-chain A/B: barrier after the refine-source transposes.

The pool gathers cost ~1.2 ms each composed but ~0.45 isolated; if the
take fused with the transpose lowers as a column-major gather, forcing
the transpose to materialize first should recover take-only speed.
Times the full bm-pass -> key_sel chain (decision-grade size) at the 1M
geometry, variants interleaved:

  V0  current (take fused over bms_t.T)
  V1  optimization_barrier after each transpose
  V2  V1 + the pos-take barriered too

Usage: SUB=32 python scripts/proto_sel10.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops import topk as T
from better_search_rag_rust_tpu.ops.topk_pallas import (
    bm2_emit_width, matmul_blockmax2_only, pick_bm2_row_tile,
)

R, D, sub, block, cpg = 1_015_808, 768, int(os.environ.get("SUB", "32")), 128, 8
VALID = 1_000_000
k, t = 100, 512
itemsize = 2
nb = R // block
nsub = R // sub
kb = min(k, nb)
spb = block // sub
sup_w = 8
ng, gw = nb // sup_w, sup_w * spb
kg = min(k, ng)
pool = kg * gw
ks = min(k + (-k) % cpg, pool - pool % cpg)
rt = pick_bm2_row_tile(R, D, t, sub, block, itemsize, extra_outs=1)
ew = bm2_emit_width(R, rt, sub, block)


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def make_chain(tbar: bool, pbar: bool):
    def chain(qq, sh):
        bms_t, key_t, bmi_t = matmul_blockmax2_only(
            qq, sh, jnp.int32(VALID), sub=sub, block=block,
            emit_block=True, emit_argmax=True, emit_width=ew or block)
        upg = (gw * sub) // ew
        gmax = jnp.max(bmi_t.T.reshape(t, ng, upg), axis=2)
        _, gids = T._fast_topk(gmax, kg)
        gids = jnp.sort(gids, axis=1)
        bms_q = bms_t.T
        key_q = key_t.T
        if tbar:
            bms_q = jax.lax.optimization_barrier(bms_q)
            key_q = jax.lax.optimization_barrier(key_q)
        cand_bm = jnp.take_along_axis(
            bms_q.reshape(t, ng, gw), gids[:, :, None], axis=1,
            mode="promise_in_bounds").reshape(t, pool)
        cand_uids = (
            gids[:, :, None] * gw
            + jnp.arange(gw, dtype=jnp.int32)[None, None, :]
        ).reshape(t, pool)
        vals, pos = T._fast_topk(cand_bm, ks)
        uids = jnp.take_along_axis(cand_uids, pos, axis=1)
        cand_key = jnp.take_along_axis(
            key_q.reshape(t, ng, gw), gids[:, :, None], axis=1,
            mode="promise_in_bounds").reshape(t, pool)
        if pbar:
            cand_key = jax.lax.optimization_barrier(cand_key)
        key_sel = jnp.take_along_axis(cand_key, pos, axis=1)
        return vals, uids, key_sel

    return jax.jit(chain)


def main():
    shard = jax.random.normal(jax.random.PRNGKey(0), (R, D),
                              dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (t, D), dtype=jnp.bfloat16)
    _force(shard); _force(q)
    cases = [
        ("V0 fused", make_chain(False, False)),
        ("V1 T-barrier", make_chain(True, False)),
        ("V2 T+pos barrier", make_chain(True, True)),
    ]
    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    for n, fn in cases:
        _force(fn(q, shard))
    best = {n: 1e9 for n, _ in cases}
    for rnd in range(4):
        out = tiny(q); _force(out)
        t0 = time.perf_counter()
        for _ in range(16):
            out = tiny(q)
        _force(out)
        sync = (time.perf_counter() - t0) / 16
        line = []
        for n, fn in cases:
            out = fn(q, shard)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(16):
                out = fn(q, shard)
            _force(out)
            dt = (time.perf_counter() - t0) / 16
            best[n] = min(best[n], dt)
            line.append(f"{n}: {dt*1e3:.2f}")
        print(f"round {rnd} sync={sync*1e3:.2f}: " + " | ".join(line),
              flush=True)
    print("raw minima (sync NOT subtracted — compare deltas):", flush=True)
    for n, _ in cases:
        print(f"{n:>18s}: {best[n]*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
