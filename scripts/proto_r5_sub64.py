"""A/B: int8 10M x 256 fullg at sub_block 128 (prod) vs 64/32 geometries."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from better_search_rag_rust_tpu.ops.topk import rescore_topk

K, Q, VALID, D = 100, 512, 10_000_000, 256
R = 10_158_080

def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[:1, :1] if leaf.ndim == 2 else leaf[:1]))

def build_store():
    from better_search_rag_rust_tpu.ops.quantize import quantize_unit
    data = jax.jit(lambda: jnp.zeros((R, D), jnp.int8))()
    fill = 1_015_808
    @jax.jit
    def fill_chunk(buf, key, start):
        x = jax.random.normal(key, (fill, D), dtype=jnp.float32)
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        x = x / jnp.where(n == 0.0, 1.0, n)
        return jax.lax.dynamic_update_slice(buf, quantize_unit(x), (start, 0))
    key = jax.random.PRNGKey(0)
    for i in range(R // fill):
        key, sub = jax.random.split(key)
        data = fill_chunk(data, sub, jnp.int32(i * fill))
    _force(data)
    return data

store = build_store()
sel = jnp.linspace(0, VALID - 1, Q).astype(jnp.int32)
queries = store[sel]
_force(queries)

cells = []
def cell(name, **kw):
    fn = jax.jit(lambda qq, sh, kw=kw: rescore_topk(
        sh, qq, K, jnp.int32(0), VALID, q_tile=512, use_pallas=True,
        block=1024, argmax_fast=False, **kw))
    cells.append((name, fn))

cell("s128", sub_block=128, cpg=4)
cell("s64c2", sub_block=64, cpg=2)
cell("s64c4", sub_block=64, cpg=4)
cell("s32c4", sub_block=32, cpg=4)

outs = {}
for nm, fn in cells:
    out = fn(queries, store); _force(out)
    outs[nm] = np.asarray(jax.device_get(out[1]))
    print(nm, "compiled", flush=True)
for nm in outs:
    print(nm, "ids==s128" if np.array_equal(outs[nm], outs["s128"]) else "MISMATCH", flush=True)

tiny = jax.jit(lambda x: x[:1, :1] + 1)
REPS, ROUNDS = 8, 4
best = {n: 1e9 for n, _ in cells}
for rnd in range(ROUNDS):
    out = tiny(queries); _force(out)
    t0 = time.perf_counter()
    for _ in range(REPS): out = tiny(queries)
    _force(out)
    sync = (time.perf_counter() - t0) / REPS
    for n, fn in cells:
        out = fn(queries, store); _force(out)
        t0 = time.perf_counter()
        for _ in range(REPS): out = fn(queries, store)
        _force(out)
        best[n] = min(best[n], (time.perf_counter() - t0) / REPS - sync)
    print(f"round {rnd} sync={sync*1e3:.2f} " +
          " ".join(f"{n}={best[n]*1e3:.2f}" for n, _ in cells), flush=True)
for n, _ in cells:
    print(f"{n}: {best[n]*1e3:.2f} ms", flush=True)
