"""Relay serve-path probes for streaming search.

Uses the real engine on a 100k-row store (device compute ~2 ms/batch) so the
measured stream loop isolates HOST-side costs: query upload, dispatch issue,
and readback of jit-COMPUTED outputs (device_put-sourced arrays keep a host
copy, so naive device_get probes read cache and measure nothing).

Variants timed per 1024-query batch over N=12 batches:
  serial   — search() loop (dispatch, collect, repeat)
  stream1  — current search_stream (lag-1 collect)
  streamD  — lag-D collect for D in (2, 4)
  packed   — lag-1 with ids bitcast+concat into ONE readback buffer
  async    — lag-1 with copy_to_host_async on both outputs at dispatch time
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu import ops, parallel, store
from better_search_rag_rust_tpu.utils.testing import mock_embeddings

Q, D, K, N = 1024, 768, 100, 12


def main():
    print("devices:", jax.devices(), flush=True)
    rows = 100_000
    mat = mock_embeddings(rows, D, seed=0)
    mesh = parallel.create_mesh()
    dstore = store.DeviceStore.from_host(mat, mesh, dtype="bfloat16")
    engine = ops.SearchEngine(dstore)
    rng = np.random.default_rng(1)
    qs = rng.standard_normal((Q, D)).astype(np.float32)

    def batches():
        return (qs for _ in range(N))

    # warm compile
    engine.search(qs, k=K)

    t0 = time.perf_counter()
    for q in batches():
        engine.search(q, k=K)
    serial = (time.perf_counter() - t0) / N
    print(f"serial search loop: {serial*1e3:.1f} ms/batch "
          f"({Q/serial:.0f} q/s)", flush=True)

    t0 = time.perf_counter()
    n = 0
    for ids, _d in engine.search_stream(batches(), k=K):
        n += ids.shape[0]
    stream = (time.perf_counter() - t0) / N
    print(f"stream lag-1 (current): {stream*1e3:.1f} ms/batch "
          f"({Q/stream:.0f} q/s)", flush=True)

    # deeper lag
    from collections import deque
    for depth in (2, 4):
        t0 = time.perf_counter()
        pend = deque()
        for q in batches():
            pend.append(engine._dispatch(q, K))
            if len(pend) > depth:
                engine._collect(pend.popleft())
        while pend:
            engine._collect(pend.popleft())
        d_t = (time.perf_counter() - t0) / N
        print(f"stream lag-{depth}: {d_t*1e3:.1f} ms/batch "
              f"({Q/d_t:.0f} q/s)", flush=True)

    # packed single readback: concat sims + bitcast ids into one f32 buffer
    @jax.jit
    def pack(vals, ids):
        return jnp.concatenate(
            [vals, jax.lax.bitcast_convert_type(ids, jnp.float32)], axis=1
        )

    def collect_packed(buf):
        host = np.asarray(jax.device_get(buf))
        sims = host[:, :K]
        ids = host[:, K:].view(np.int32)
        return ids.astype(np.int64), 1.0 - np.clip(sims, -1.0, 1.0)

    pend = engine._dispatch(qs, K)
    pb = pack(*pend)
    collect_packed(pb)  # warm
    t0 = time.perf_counter()
    prev = None
    for q in batches():
        cur = pack(*engine._dispatch(q, K))
        if prev is not None:
            collect_packed(prev)
        prev = cur
    collect_packed(prev)
    p_t = (time.perf_counter() - t0) / N
    print(f"stream lag-1 packed: {p_t*1e3:.1f} ms/batch "
          f"({Q/p_t:.0f} q/s)", flush=True)

    # async copies started at dispatch time
    t0 = time.perf_counter()
    prev = None
    for q in batches():
        cur = engine._dispatch(q, K)
        for a in cur:
            a.copy_to_host_async()
        if prev is not None:
            engine._collect(prev)
        prev = cur
    engine._collect(prev)
    a_t = (time.perf_counter() - t0) / N
    print(f"stream lag-1 async-copy: {a_t*1e3:.1f} ms/batch "
          f"({Q/a_t:.0f} q/s)", flush=True)

    # upload-only and compute-only decomposition
    t0 = time.perf_counter()
    for _ in range(N):
        jax.device_put(qs).block_until_ready()
    up = (time.perf_counter() - t0) / N
    print(f"upload only: {up*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
