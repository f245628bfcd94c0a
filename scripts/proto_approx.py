"""Prototype: approx_max_k(recall_target=1.0) as the exact selection engine.

Validates two things on the real chip:
1. Set-validity: at rt=1.0 the returned k' values are exactly the k' largest
   values (multiset equality vs numpy) across adversarial inputs — ties,
   duplicates, clustered tops, all-equal rows.
2. Speed: approx path vs lax.top_k vs the shipping blockmax+gather pipeline
   on [T, 1M] f32.

Design under test ("approx-first"):
  sims = matmul (f32 accum)                    [T, R]
  avals, apos = approx_max_k(sims, k'=128, rt=1.0)
  w = avals[:, k-1]; certificate: count(avals >= w) < k'
    -> all elements >= w are inside the k' candidates -> the oracle top-k
       (val desc, id asc) is computable from candidates alone.
  certificate failure (>= k'-k boundary ties) -> exact fallback.
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


def timeit(label, fn, *args, iters=6):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:>34s}: {dt * 1e3:9.2f} ms", flush=True)
    return dt


def check_set_validity():
    """avals multiset == numpy top-k' multiset, adversarial inputs."""
    print("== set-validity fuzz ==", flush=True)
    kp = 128
    rng = np.random.default_rng(0)
    cases = []
    # random floats
    cases.append(("random", rng.standard_normal((8, 50_000)).astype(np.float32)))
    # heavy ties: quantized to 64 levels
    x = rng.standard_normal((8, 50_000)).astype(np.float32)
    cases.append(("quantized64", np.round(x * 8) / 8))
    # clustered tops: top values adjacent
    x = rng.standard_normal((8, 50_000)).astype(np.float32)
    x[:, 1000:1200] += 10.0
    cases.append(("clustered", x))
    # all-equal rows
    cases.append(("all_equal", np.ones((8, 50_000), np.float32)))
    # duplicates of the max scattered
    x = rng.standard_normal((8, 50_000)).astype(np.float32)
    x[:, ::97] = 5.0
    cases.append(("dup_max", x))

    @jax.jit
    def approx(s):
        return jax.lax.approx_max_k(s, kp, recall_target=1.0)

    ok = True
    for name, x in cases:
        avals, apos = jax.device_get(approx(jnp.asarray(x)))
        for r in range(x.shape[0]):
            true = np.sort(x[r])[::-1][:kp]
            got = np.sort(np.asarray(avals[r]))[::-1]
            if not np.array_equal(true, got):
                print(f"  {name} row {r}: MISMATCH", true[:5], got[:5], flush=True)
                ok = False
                break
            # positions must be distinct and consistent
            pos = np.asarray(apos[r])
            if len(set(pos.tolist())) != kp:
                print(f"  {name} row {r}: duplicate positions!", flush=True)
                ok = False
                break
            if not np.allclose(x[r][pos], avals[r]):
                print(f"  {name} row {r}: vals!=x[pos]", flush=True)
                ok = False
                break
        print(f"  {name}: {'OK' if ok else 'FAIL'}", flush=True)
    return ok


def bench():
    print("== speed on [T, 1M] ==", flush=True)
    R = 1_000_000
    Rpad = 1_015_808  # same padding the 1M store uses
    D = 768
    k, kp = 100, 128
    key = jax.random.PRNGKey(0)

    for T in (512, 1024):
        sims = jax.random.normal(key, (T, Rpad), dtype=jnp.float32)
        _force(sims)

        @jax.jit
        def apx(s):
            return jax.lax.approx_max_k(s, kp, recall_target=1.0)

        @jax.jit
        def exact(s):
            return jax.lax.top_k(s, k)

        timeit(f"approx_max_k rt=1.0 T={T}", apx, sims)
        timeit(f"lax.top_k T={T}", exact, sims)
        del sims

    # full pipeline: matmul -> approx -> certificate -> canonical sort
    data = jax.random.normal(key, (Rpad, D), dtype=jnp.bfloat16)
    _force(data)
    for T in (512, 1024):
        q = jax.random.normal(jax.random.PRNGKey(1), (T, D), dtype=jnp.bfloat16)
        _force(q)

        @jax.jit
        def full(qq, dd):
            sims = jnp.dot(qq, dd.T, preferred_element_type=jnp.float32)
            avals, apos = jax.lax.approx_max_k(sims, kp, recall_target=1.0)
            w = avals[:, k - 1:k]
            cert = jnp.sum((avals >= w).astype(jnp.int32), axis=1) < kp
            # canonical (val desc, id asc) order among candidates
            neg, ids = jax.lax.sort((-avals, apos), num_keys=2)
            return -neg[:, :k], ids[:, :k], jnp.all(cert)

        dt = timeit(f"full approx pipeline T={T}", full, q, data)
        print(f"    -> {T / dt:,.0f} q/s per tile-batch "
              f"(x{1024 // T} tiles for 1024q: {1024 / (dt * (1024 // T)):,.0f} q/s)",
              flush=True)

    # certificate truthfulness on real-ish data: normalized rows
    @jax.jit
    def cert_rate(qq, dd):
        sims = jnp.dot(qq, dd.T, preferred_element_type=jnp.float32)
        avals, _ = jax.lax.approx_max_k(sims, kp, recall_target=1.0)
        w = avals[:, k - 1:k]
        return jnp.sum((jnp.sum((avals >= w).astype(jnp.int32), axis=1) < kp))

    q = jax.random.normal(jax.random.PRNGKey(2), (512, D), dtype=jnp.bfloat16)
    n_ok = int(jax.device_get(cert_rate(q, data)))
    print(f"certificate pass rate: {n_ok}/512", flush=True)


if __name__ == "__main__":
    ok = check_set_validity()
    print(f"SET VALIDITY: {'PASS' if ok else 'FAIL'}", flush=True)
    bench()
