"""Round-10 selection A/B at 1M: PRODUCTION two-level group selection
(coarse gsel -> pool gather [T, R/sub]-scan -> pool _fast_topk -> key take)
vs FLAT selection (_fast_topk directly over the full [T, R/sub] unit-max
row, skipping gsel + the pool gather entirely).

Rationale: the stage profile (proto_int8_stages) charges the int8 tail
gsel+pool = 1.13 ms/tile, most of it the 32.5 MB bms pool-gather scan.
approx_max_k is a PartialReduce (bandwidth-shaped, not gather-lowering-
shaped), so one flat pass over the same bytes may beat gather+small-topk.
Both variants end with the identical key take so the comparison isolates
the selection half. uids/vals must agree BITWISE (same (max desc, idx asc)
total order) — checked before timing.

Usage: python scripts/proto_r4_sel.py [reps=16] [rounds=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops.quantize import quantize_unit
from better_search_rag_rust_tpu.ops.topk import _fast_topk
from better_search_rag_rust_tpu.ops.topk_pallas import (
    matmul_blockmax2_only,
)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
K, Q = 100, 512
R, VALID, D = 1_015_808, 1_000_000, 768
SUB, BLOCK = 64, 128


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def build(dtype_tag):
    t = Q
    nb = R // BLOCK
    spb = BLOCK // SUB
    sup_w = 8
    ng, gw = nb // sup_w, sup_w * spb
    kg = min(K, ng)
    pool = kg * gw
    ks = 104
    nunits = R // SUB

    def bm(qq, sh):
        return matmul_blockmax2_only(
            qq, sh, jnp.int32(VALID), sub=SUB, block=BLOCK,
            emit_block=True, emit_argmax=True, emit_width=BLOCK,
        )

    def sel_prod(qq, sh):
        bms_t, key_t, bmi_t = bm(qq, sh)
        upg = (gw * SUB) // BLOCK
        gmax = jnp.max(bmi_t.T.reshape(t, ng, upg), axis=2)
        _, gids = _fast_topk(gmax, kg)
        gids = jnp.sort(gids, axis=1)
        bms3 = bms_t.T.reshape(t, ng, gw)
        cand_bm = jnp.take_along_axis(
            bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
        ).reshape(t, pool)
        vals, pos = _fast_topk(cand_bm, ks)
        g_of = jnp.take_along_axis(gids, pos // gw, axis=1,
                                   mode="promise_in_bounds")
        uids = g_of * gw + pos % gw
        key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                      mode="promise_in_bounds")
        return vals, uids, key_sel

    def sel_flat(qq, sh):
        bms_t, key_t, _bmi_t = bm(qq, sh)
        vals, uids = _fast_topk(bms_t.T, ks)  # [T, nunits] one pass
        key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                      mode="promise_in_bounds")
        return vals, uids, key_sel

    def sel_flat_noemit(qq, sh):
        # flat selection does not need the coarse bmi emission at all
        bms_t, key_t = matmul_blockmax2_only(
            qq, sh, jnp.int32(VALID), sub=SUB, block=BLOCK,
            emit_block=False, emit_argmax=True, emit_width=BLOCK,
        )
        vals, uids = _fast_topk(bms_t.T, ks)
        key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                      mode="promise_in_bounds")
        return vals, uids, key_sel

    return [(f"{dtype_tag}_prod", jax.jit(sel_prod)),
            (f"{dtype_tag}_flat", jax.jit(sel_flat)),
            (f"{dtype_tag}_flat0", jax.jit(sel_flat_noemit))]


def main():
    raw = jax.random.normal(jax.random.PRNGKey(0), (R, D), dtype=jnp.bfloat16)
    norm = raw.astype(jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    store8 = jax.jit(quantize_unit)(norm)
    store16 = norm.astype(jnp.bfloat16)
    del raw, norm
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
    data = {"i8": (store8[sel], store8), "bf16": (store16[sel], store16)}
    cells = []
    for tag, (qq, sh) in data.items():
        for nm, fn in build(tag):
            cells.append((nm, fn, qq, sh))

    # exactness: prod and flat must produce bitwise-identical outputs
    for tag, (qq, sh) in data.items():
        fns = dict(build(tag))
        ref = [np.asarray(jax.device_get(x)) for x in fns[f"{tag}_prod"](qq, sh)]
        for v in ("flat", "flat0"):
            got = [np.asarray(jax.device_get(x))
                   for x in fns[f"{tag}_{v}"](qq, sh)]
            for name, a, b in zip(("vals", "uids", "key_sel"), ref, got):
                # containment guarantees the top-K prefix only; units at
                # positions K..ks-1 are padding and may differ (prod's
                # pool restricts them to selected groups, flat's doesn't)
                assert np.array_equal(a[:, :K], b[:, :K]), \
                    f"{tag}_{v} {name} MISMATCH"
        print(f"{tag}: prod == flat == flat0 (bitwise on top-K)", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    for nm, fn, qq, sh in cells:
        _force(fn(qq, sh))
    best = {n: 1e9 for n, *_ in cells}
    for rnd in range(ROUNDS):
        out = tiny(data["i8"][0]); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(data["i8"][0])
        _force(out)
        sync = (time.perf_counter() - t0) / REPS
        for n, fn, qq, sh in cells:
            out = fn(qq, sh)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(qq, sh)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n}={best[n]*1e3:.2f}" for n, *_ in cells),
              flush=True)
    for n, *_ in cells:
        print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
