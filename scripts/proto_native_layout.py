"""DECISION-GRADE in-process A/B: selection-tail gathers on the bm
kernel's NATIVE [R/sub, T] layout vs the current transposed-source form.

The argmax fast path's tail reads three kernel outputs laid out
[rows, T] (rows on the sublane axis — the only Mosaic-legal emission)
and immediately transposes each before a per-query gather/reduce:

  gmax    = max(bmi_t.T.reshape(T, ng, upg), axis=2)       16 MB source
  cand_bm = take_along_axis(bms_t.T.reshape(T, ng, gw), gids)  32.5 MB
  key_sel = take_along_axis(key_t.T, uids, axis=1)             32.5 MB

If XLA fuses the transpose into the gather, the scan reads the source
with transposed (uncoalesced) access; if it materializes the transpose,
each stage pays an extra 2x source traffic. Either way the same math is
expressible on the NATIVE layout — gather along axis 0 with [idx, T]
indices, reduce on axis 1 — and only the tiny [ks|pool|ng, T] RESULTS
get transposed. A third cell forces a materialized transpose
(optimization_barrier) before the current gathers to separate
"transpose fusion hurts" from "gather lowering is just slow".

All cells compute identical values (gather semantics + order-independent
max) — checked. The tail is dtype-independent (bms f32 / key int32 /
bmi f32 regardless of store dtype), so one input set decides both.

Usage: python scripts/proto_native_layout.py [reps=16] [rounds=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.ops.topk import PAD_SIM, _fast_topk
from better_search_rag_rust_tpu.ops.topk_pallas import m2_sort_key

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
K, T = 100, 512
R, SUB, BLOCK = 1_015_808, 64, 128
GD = 4
NB = R // BLOCK                  # 7936 block rows
SPB = BLOCK // SUB               # 2
SUP_W = 8
NG, GW = NB // SUP_W, SUP_W * SPB  # 992 groups x 16 units
KG = min(K, NG)
POOL = KG * GW                   # 1600
KS = 104
UPG = (GW * SUB) // BLOCK        # 8 block-maxima per group
NU = R // SUB                    # 15872 units
int_max = jnp.iinfo(jnp.int32).max


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))


def _finish(vals, uids, key_sel):
    """Shared cheap epilogue (danger cert + capacity select) — [T, ks]."""
    arg_sel = key_sel & 0x7F
    w = jax.lax.dynamic_slice_in_dim(vals, K - 1, 1, axis=1)
    w_key = m2_sort_key(w)
    a_gids = jnp.where(vals > PAD_SIM, uids * SUB + arg_sel, int_max)
    danger_count = jnp.sum((key_sel >= w_key).astype(jnp.int32), axis=1)
    cert = jnp.all(danger_count <= GD)
    _, dpos = jax.lax.top_k(key_sel, GD)
    d_uids = jnp.take_along_axis(uids, dpos, axis=1)
    return vals, a_gids, cert, jnp.sort(d_uids, axis=1)


def tail_cur(bms_t, key_t, bmi_t):
    """Current production formulation (transposed sources)."""
    gmax = jnp.max(bmi_t.T.reshape(T, NG, UPG), axis=2)
    _, gids = _fast_topk(gmax, KG)
    gids = jnp.sort(gids, axis=1)
    bms3 = bms_t.T.reshape(T, NG, GW)
    cand_bm = jnp.take_along_axis(
        bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(T, POOL)
    vals, pos = _fast_topk(cand_bm, KS)
    g_of = jnp.take_along_axis(gids, pos // GW, axis=1,
                               mode="promise_in_bounds")
    uids = g_of * GW + pos % GW
    key_sel = jnp.take_along_axis(key_t.T, uids, axis=1,
                                  mode="promise_in_bounds")
    return _finish(vals, uids, key_sel)


def tail_nat(bms_t, key_t, bmi_t):
    """Native-layout formulation: axis-0 gathers, tiny-result transposes."""
    gmax = jnp.max(bmi_t.reshape(NG, UPG, T), axis=1).T       # [T, NG]
    _, gids = _fast_topk(gmax, KG)
    gids = jnp.sort(gids, axis=1)
    gidx = (
        gids.T[:, None, :] * GW
        + jnp.arange(GW, dtype=jnp.int32)[None, :, None]
    ).reshape(POOL, T)                                        # [POOL, T]
    cand_bm = jnp.take_along_axis(
        bms_t, gidx, axis=0, mode="promise_in_bounds"
    ).T                                                       # [T, POOL]
    vals, pos = _fast_topk(cand_bm, KS)
    g_of = jnp.take_along_axis(gids, pos // GW, axis=1,
                               mode="promise_in_bounds")
    uids = g_of * GW + pos % GW
    key_sel = jnp.take_along_axis(
        key_t, uids.T, axis=0, mode="promise_in_bounds"
    ).T                                                       # [T, KS]
    return _finish(vals, uids, key_sel)


def tail_mat(bms_t, key_t, bmi_t):
    """Current gathers but from FORCED-materialized transposed sources."""
    bms_tt, key_tt, bmi_tt = jax.lax.optimization_barrier(
        (bms_t.T, key_t.T, bmi_t.T))
    gmax = jnp.max(bmi_tt.reshape(T, NG, UPG), axis=2)
    _, gids = _fast_topk(gmax, KG)
    gids = jnp.sort(gids, axis=1)
    bms3 = bms_tt.reshape(T, NG, GW)
    cand_bm = jnp.take_along_axis(
        bms3, gids[:, :, None], axis=1, mode="promise_in_bounds"
    ).reshape(T, POOL)
    vals, pos = _fast_topk(cand_bm, KS)
    g_of = jnp.take_along_axis(gids, pos // GW, axis=1,
                               mode="promise_in_bounds")
    uids = g_of * GW + pos % GW
    key_sel = jnp.take_along_axis(key_tt, uids, axis=1,
                                  mode="promise_in_bounds")
    return _finish(vals, uids, key_sel)


def main():
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    # Realistic value ranges: unit-vector sims in [-1, 1]; the packed key
    # is any int32. bmi must be the true 8-block group coarse maxima of
    # bms for the two formulations to agree.
    bms_host = jax.random.uniform(k0, (NU, T), jnp.float32, -1.0, 1.0)
    bmi_host = jnp.max(bms_host.reshape(NB, SPB, T), axis=1)
    key_host = jax.random.randint(k1, (NU, T), -2**31, 2**31 - 1, jnp.int32)
    bms_t = jax.device_put(bms_host)
    key_t = jax.device_put(key_host)
    bmi_t = jax.device_put(bmi_host)
    del bms_host, bmi_host, key_host

    cells = [("cur", jax.jit(tail_cur)),
             ("nat", jax.jit(tail_nat)),
             ("mat", jax.jit(tail_mat))]
    ref = None
    for nm, fn in cells:
        out = fn(bms_t, key_t, bmi_t)
        _force(out)
        if ref is None:
            ref = jax.device_get(out)
        else:
            got = jax.device_get(out)
            same = all(np.array_equal(a, b) for a, b in zip(ref, got))
            print(f"identical cur vs {nm}: {same}", flush=True)
        print(f"{nm}: compiled", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    best = {n: 1e9 for n, _ in cells}
    for rnd in range(ROUNDS):
        out = tiny(bms_t); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(bms_t)
        _force(out)
        sync = (time.perf_counter() - t0) / REPS
        for n, fn in cells:
            out = fn(bms_t, key_t, bmi_t)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(bms_t, key_t, bmi_t)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n}={best[n]*1e3:.2f}" for n, _ in cells),
              flush=True)
    for n, _ in cells:
        print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
