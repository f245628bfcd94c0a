"""f32 fast-path measurement (VERDICT r4 #2): can the f32 store beat the
dense two-stage path (13.3k q/s, MFU 0.10) without giving up ranked
oracle exactness?

The obstacle: Mosaic f32 dots are NOT oracle arithmetic on real TPUs
(default = one bf16 pass, ~3e-1 err on raw gaussians; precision=HIGHEST
still ~2e-5 off XLA HIGHEST — ledger), so the bf16 rescore machinery
cannot simply run on f32. The design measured here — "certified
two-stage f32" — splits the roles:

  * SELECTION may use bounded-error arithmetic. For NORMALIZED rows and
    queries the single-bf16-pass error is soundly bounded:
    |s^ - s| <= 2^-8 * ||q|| * ||r|| + D * 2^-24 ~ 0.0042. A Mosaic
    bm pass over the f32 store (one pass, full MXU rate, no sims
    materialized) selects top-ks units with an EPS1 margin.
  * FINAL SCORES must be bitwise XLA-HIGHEST (the oracle's arithmetic).
    A Pallas gather-ROWS kernel (DMA only, no dot — memory movement is
    dtype-exact) compacts each query's candidate rows; XLA then scores
    them with 2D HIGHEST dots via the 8-query keep-row-r trick. This is
    exact iff XLA HIGHEST dots are shape-independent over the K dim
    (stage Q1 proves/refutes on hardware — the same property the bf16
    path's chip-verified "row of a matmul == 1-row matmul" relies on).
  * CERT: per tile, exact s_k must exceed (ks-th selected unit's bm^ +
    EPS1) — then no unselected row can reach the top-k. Cert failure
    (clustered/tied stores) falls back to the dense path; on random
    benchmark stores it should never fire.

Stages:
  Q1  XLA HIGHEST shape-independence (full sims vs subset dot vs 8-group
      keep-row-r) — bitwise or the whole approach is a dead end.
  Q2  Mosaic bm2-only on f32 operands: measured max |bm^ - exact| vs the
      sound EPS1 bound, and ms/tile at 1M x 768.
  Q3  E2E A/B at 1M x 768 f32, 1024 queries, k=100: engine dense (prod
      baseline) vs certified two-stage; ranked ids vs serial oracle.

Usage: python scripts/proto_f32_rescore.py [reps=8] [rounds=4]
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

from better_search_rag_rust_tpu.ops.topk import PAD_SIM, _fast_topk
from better_search_rag_rust_tpu.ops.topk_pallas import (
    matmul_blockmax2_only,
)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K, Q, T = 100, 1024, 512
R, VALID, D = 1_015_808, 1_000_000, 768
SUB, BLOCK = 8, 1024           # f32 sublane tile is 8
SUPW = 32                      # units per selection group
KG = 256                       # selected groups per query
KS = 192                       # selected units per query (margin > ~160)
CPG = 8                        # units per gather grid step
EPS1 = np.float32(2.0 ** -8 * 1.25 + 768 * 2.0 ** -24)  # sound, RN or RTZ slack


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def hi_dot(a, b):
    """The oracle contraction: XLA f32 HIGHEST, [n, d] x [m, d] -> [n, m]."""
    return jax.lax.dot_general(
        a, b, ((((1,), (1,)), ((), ()))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


# --------------------------------------------------------------------------
# gather-ROWS kernel: DMA each query's cpg candidate units per grid step
# into a compacted [T, KS*SUB, D] buffer. No arithmetic — bit-exact moves.
# --------------------------------------------------------------------------
def _make_gather_rows_kernel(cpg: int, unit: int):
    def _kernel(ids_ref, *refs):
        o_ref = refs[-1]
        for r in range(8):
            for u in range(cpg):
                o_ref[r, u * unit:(u + 1) * unit, :] = refs[r * cpg + u][:]

    return _kernel


@functools.partial(jax.jit, static_argnames=("unit", "cpg", "interpret"))
def gather_rows(shard, ids, *, unit=SUB, cpg=CPG, interpret=False):
    r, d = shard.shape
    t, ks = ids.shape
    assert t % 8 == 0 and ks % cpg == 0 and r % unit == 0

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
            bytes_accessed=2 * t * ks * unit * d * shard.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids, *([shard] * (8 * cpg)))
    return out


# --------------------------------------------------------------------------
# Stage Q1: XLA HIGHEST shape independence
# --------------------------------------------------------------------------
def stage_q1(shard, queries):
    rs = 131072
    sub_idx = np.arange(0, rs, rs // 1536, dtype=np.int32)[:1536]
    q8 = queries[:8]

    @jax.jit
    def full(qq, sh):
        return hi_dot(qq, sh[:rs])

    @jax.jit
    def subset(qq, sh):
        return hi_dot(qq, sh[jnp.asarray(sub_idx)])

    @jax.jit
    def group8(qq, sh):
        # keep-row-r: one [8, 8*c] dot; query r keeps its own c-slice —
        # the arrangement the E2E final stage uses.
        rows = sh[jnp.asarray(sub_idx)]                    # [c, d] shared
        cat = jnp.tile(rows, (8, 1))                       # [8c, d]
        s = hi_dot(qq, cat)                                # [8, 8c]
        c = sub_idx.shape[0]
        return s.reshape(8, 8, c)[jnp.arange(8), jnp.arange(8)]

    a = np.asarray(jax.device_get(full(q8, shard)))
    b = np.asarray(jax.device_get(subset(q8, shard)))
    g = np.asarray(jax.device_get(group8(q8, shard)))
    sub_full = a[:, sub_idx]
    bit_sub = np.array_equal(sub_full, b)
    bit_grp = np.array_equal(sub_full, g)
    print(f"Q1 subset bitwise={bit_sub} max|d|={np.abs(sub_full-b).max():.3e}"
          f"  group8 bitwise={bit_grp} max|d|={np.abs(sub_full-g).max():.3e}",
          flush=True)
    return bit_sub and bit_grp


# --------------------------------------------------------------------------
# Stage Q2: Mosaic f32 bm pass error + timing
# --------------------------------------------------------------------------
def stage_q2(shard, queries):
    @jax.jit
    def bm_pass(qq, sh):
        return matmul_blockmax2_only(
            qq, sh, jnp.int32(VALID), sub=SUB, block=BLOCK,
            emit_block=False, emit_argmax=False,
        )

    q64 = queries[:64]
    rs = 131072
    bms = np.asarray(jax.device_get(bm_pass(q64, shard)))  # [R/sub, 64].T?
    # matmul_blockmax2_only returns bm_sub [R/sub, T]
    got = bms.T[:, : rs // SUB]                              # [64, rs/sub]

    @jax.jit
    def exact_bm(qq, sh):
        s = hi_dot(qq, sh[:rs])
        return jnp.max(s.reshape(qq.shape[0], rs // SUB, SUB), axis=2)

    want = np.asarray(jax.device_get(exact_bm(q64, shard)))
    err = np.abs(got - want).max()
    ok = err <= float(EPS1)
    print(f"Q2 mosaic-f32 bm err max={err:.3e} (EPS1={float(EPS1):.3e})"
          f" sound={ok}", flush=True)
    return ok, bm_pass


# --------------------------------------------------------------------------
# Stage Q3: E2E certified two-stage vs engine dense
# --------------------------------------------------------------------------
def build_fast():
    nunits = R // SUB
    nsup = nunits // SUPW
    int_max = jnp.iinfo(jnp.int32).max

    def tile(qq, sh):
        t = qq.shape[0]
        bms_t = matmul_blockmax2_only(
            qq, sh, jnp.int32(VALID), sub=SUB, block=BLOCK,
            emit_block=False, emit_argmax=False,
        )                                                   # [nunits, T]
        bm = bms_t.T                                        # [T, nunits]
        gmax = jnp.max(bm.reshape(t, nsup, SUPW), axis=2)
        _, gids = _fast_topk(gmax, KG)
        gids = jnp.sort(gids, axis=1)
        pool = jnp.take_along_axis(
            bm.reshape(t, nsup, SUPW), gids[:, :, None], axis=1,
            mode="promise_in_bounds",
        ).reshape(t, KG * SUPW)
        vals, pos = _fast_topk(pool, KS)                    # bm^ of top units
        g_of = jnp.take_along_axis(gids, pos // SUPW, axis=1,
                                   mode="promise_in_bounds")
        uids = jnp.sort(g_of * SUPW + pos % SUPW, axis=1)   # ascending
        rows = gather_rows(sh, uids)                        # [T, KS*SUB, D]
        c = KS * SUB

        def group_fn(args):
            q8, r8 = args                                   # [8,D], [8,c,D]
            s = hi_dot(q8, r8.reshape(8 * c, D))            # [8, 8c]
            return s.reshape(8, 8, c)[jnp.arange(8), jnp.arange(8)]

        sims = jax.lax.map(
            group_fn, (qq.reshape(t // 8, 8, D), rows.reshape(t // 8, 8, c, D))
        ).reshape(t, c)
        rid = (
            uids[:, :, None] * SUB
            + jnp.arange(SUB, dtype=jnp.int32)[None, None, :]
        ).reshape(t, c)
        ok = rid < VALID
        sims = jnp.where(ok, sims, PAD_SIM)
        rid = jnp.where(ok, rid, int_max)
        neg, ids_sorted = jax.lax.sort((-(sims + 0.0), rid), num_keys=2)
        top_vals, top_ids = -neg[:, :K], ids_sorted[:, :K]
        # cert: k-th exact score strictly beats every unselected unit's
        # reachable score (bm^ of the ks-th unit + EPS1)
        cert = jnp.all(
            top_vals[:, K - 1] > vals[:, KS - 1] + EPS1
        )
        return top_vals, top_ids, cert

    @jax.jit
    def run(queries, sh):
        tiles = queries.reshape(Q // T, T, D)
        vals, ids, certs = jax.lax.map(lambda qb: tile(qb, sh), tiles)
        return (vals.reshape(Q, K), ids.reshape(Q, K), jnp.all(certs))

    return run


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    key = jax.random.PRNGKey(0)
    raw = jax.random.normal(key, (R, D), dtype=jnp.bfloat16)
    shard = raw.astype(jnp.float32)
    shard = shard / jnp.linalg.norm(shard, axis=1, keepdims=True)
    # zero out the padding tail like the device store does
    shard = shard * (jnp.arange(R)[:, None] < VALID)
    shard = jax.device_put(shard)
    sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
    queries = shard[sel]
    del raw

    ok1 = stage_q1(shard, queries)
    ok2, _bm = stage_q2(shard, queries)
    if not ok1:
        print("Q1 FAILED: XLA HIGHEST is shape-dependent -> certified "
              "two-stage is a DEAD END; record and stop.", flush=True)
        return
    if not ok2:
        print("Q2 FAILED: EPS1 bound violated -> enlarge bound or stop.",
              flush=True)
        return

    fast = build_fast()

    # --- exactness vs serial oracle (XLA HIGHEST big matmul, tie by id) ---
    @jax.jit
    def oracle(qq, sh):
        s = hi_dot(qq, sh)
        s = jnp.where(jnp.arange(R)[None, :] < VALID, s, PAD_SIM)
        neg, ids = jax.lax.sort(
            (-(s + 0.0), jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32),
                                          s.shape)), num_keys=2)
        return -neg[:, :K], ids[:, :K]

    f_vals, f_ids, cert = (np.asarray(jax.device_get(x))
                           for x in fast(queries, shard))
    o_vals, o_ids = (np.asarray(jax.device_get(x))
                     for x in oracle(queries[:64], shard))
    ids_eq = np.array_equal(f_ids[:64], o_ids)
    vals_eq = np.array_equal(f_vals[:64], o_vals)
    print(f"Q3 cert={bool(cert)} ids==oracle[64q]={ids_eq} "
          f"vals bitwise={vals_eq}", flush=True)
    if not ids_eq:
        bad = np.argwhere(f_ids[:64] != o_ids)[:5]
        print(f"   first diffs {bad.tolist()}", flush=True)

    # --- baseline: engine dense f32 ---
    from better_search_rag_rust_tpu.config import SearchConfig
    from better_search_rag_rust_tpu.ops import SearchEngine
    from better_search_rag_rust_tpu.parallel.mesh import create_mesh
    from better_search_rag_rust_tpu.store import DeviceStore

    mesh = create_mesh()
    host = np.asarray(jax.device_get(shard[:VALID]), dtype=np.float32)
    dstore = DeviceStore.from_host(host, mesh, dtype="float32")
    eng = SearchEngine(dstore, SearchConfig())
    qhost = np.asarray(jax.device_get(queries), dtype=np.float32)
    qdev = eng.prepare_device_queries(qhost)

    def run_dense():
        return eng.search_device(qdev, k=K)

    def run_fast():
        return fast(queries, shard)

    cells = [("dense", run_dense), ("fast", run_fast)]
    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    for _n, fn in cells:
        _force(fn())
    best = {n: 1e9 for n, _ in cells}
    for rnd in range(ROUNDS):
        out = tiny(queries)
        _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(queries)
        _force(out)
        sync = (time.perf_counter() - t0) / REPS
        for n, fn in cells:
            out = fn()
            _force(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn()
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n}={best[n]*1e3:.2f}ms" for n, _ in cells),
              flush=True)
    for n, _ in cells:
        print(f"{n}: {best[n]*1e3:.2f} ms -> {Q/best[n]:.0f} q/s", flush=True)


if __name__ == "__main__":
    main()
