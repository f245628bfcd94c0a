"""Round-9 residual tail sweeps, interleaved in one process:

* 10M x 256 int8 FULL-GATHER path: sup_w 8 (prod) vs 4 vs 2 — the pool
  refine there is kg * sup_w * spb = 6400 wide at sw8 (spb=8!), far wider
  than the 1M geometry's 1600, so narrower groups may matter where the 1M
  sweep said they don't.
* 1M x 768 bf16 argmax path: danger_cpg 2 (prod, 2 steps of 2) vs 4
  (1 step of 4) — round 6 only measured gd=8 shapes.

Usage: python scripts/proto_r3_tail2.py [reps=10] [rounds=4]
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
from better_search_rag_rust_tpu.ops.topk import rescore_topk

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K, Q = 100, 512
R10, V10, D10 = 10_158_080, 10_000_000, 256
R1, V1, D1 = 1_015_808, 1_000_000, 768


def _force(out) -> None:
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1]))


def build_10m():
    data = jax.jit(lambda: jnp.zeros((R10, D10), jnp.int8))()
    fill = 1_015_808

    @jax.jit
    def fill_chunk(buf, key, start):
        x = jax.random.normal(key, (fill, D10), dtype=jnp.float32)
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        x = x / jnp.where(n == 0.0, 1.0, n)
        return jax.lax.dynamic_update_slice(buf, quantize_unit(x), (start, 0))

    key = jax.random.PRNGKey(0)
    for i in range(R10 // fill):
        key, sub = jax.random.split(key)
        data = fill_chunk(data, sub, jnp.int32(i * fill))
    _force(data)
    return data


def main():
    store10 = build_10m()
    raw = jax.random.normal(jax.random.PRNGKey(1), (R1, D1), jnp.bfloat16)
    norm = raw.astype(jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=1, keepdims=True)
    store1 = norm.astype(jnp.bfloat16)
    del raw, norm
    q10 = store10[jnp.linspace(0, V10 - 1, Q).astype(jnp.int32)]
    q1 = store1[jnp.linspace(0, V1 - 1, Q).astype(jnp.int32)]

    def fullg(sh, qq, sw):
        return rescore_topk(
            sh, qq, K, jnp.int32(0), V10, q_tile=512, use_pallas=True,
            sub_block=128, block=1024, cpg=4, argmax_fast=False, sup_w=sw,
        )

    def af1m(sh, qq, dcpg):
        return rescore_topk(
            sh, qq, K, jnp.int32(0), V1, q_tile=512, use_pallas=True,
            sub_block=64, block=128, cpg=4, argmax_fast=True,
            danger_units=4, danger_cpg=dcpg,
        )

    cells = [
        ("10m_sw8", jax.jit(lambda s, q: fullg(s, q, 8)), store10, q10),
        ("10m_sw4", jax.jit(lambda s, q: fullg(s, q, 4)), store10, q10),
        ("10m_sw2", jax.jit(lambda s, q: fullg(s, q, 2)), store10, q10),
        ("1m_dcpg2", jax.jit(lambda s, q: af1m(s, q, 2)), store1, q1),
        ("1m_dcpg4", jax.jit(lambda s, q: af1m(s, q, 4)), store1, q1),
    ]
    outs = {}
    for nm, fn, sh, qq in cells:
        out = fn(sh, qq)
        _force(out)
        outs[nm] = np.asarray(jax.device_get(out[1]))
        print(f"{nm}: compiled", flush=True)
    for a, b in (("10m_sw4", "10m_sw8"), ("10m_sw2", "10m_sw8"),
                 ("1m_dcpg4", "1m_dcpg2")):
        print(f"{a} == {b}: {np.array_equal(outs[a], outs[b])}", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1)
    best = {n: 1e9 for n, *_ in cells}
    for rnd in range(ROUNDS):
        out = tiny(q10); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = tiny(q10)
        _force(out)
        sync = (time.perf_counter() - t0) / REPS
        for n, fn, sh, qq in cells:
            out = fn(sh, qq)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(sh, qq)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
        print(f"round {rnd} sync={sync*1e3:.2f} " +
              " ".join(f"{n}={best[n]*1e3:.2f}" for n, *_ in cells),
              flush=True)
    for n, *_ in cells:
        print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
