"""Chip A/B: xla_bf16 attention chain vs the fused Pallas kernels.

One layer's attention core at the serving shape (B=256, H=12, S=512,
hd=64), timed interleaved: (a) the production xla_bf16 chain
(rotary + einsum + f32 softmax + einsum), (b) fused_attention_qkv
(combined [B,S,2304] layout, zero transposes), (c) fused_attention
(head-major, with the transposes the caller would pay).

Usage: python scripts/proto_attn.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from better_search_rag_rust_tpu.models.nomic import apply_rotary, rotary_tables
from better_search_rag_rust_tpu.ops.attention_pallas import (
    fused_attention, fused_attention_qkv, rotary_roll_tables)

B, H, S, hd = 256, 12, 512, 64


def _force(out) -> None:
    np.asarray(jax.device_get(out[:1, :1] if out.ndim == 2 else out[:1, :1, :1]))


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((B, S, 3 * H * hd)).astype(np.float32),
        dtype=jnp.bfloat16)
    cos, sin = rotary_tables(S, hd, base=1000.0)
    c2np, s2np = rotary_roll_tables(cos, sin)
    c2, s2 = jnp.asarray(c2np), jnp.asarray(s2np)
    cosj, sinj = jnp.asarray(cos), jnp.asarray(sin)
    bias = jnp.zeros((B, S), jnp.float32)
    scale = 1.0 / math.sqrt(hd)

    def xla_chain(qkv_in):
        x = qkv_in.reshape(B, S, 3, H, hd)
        q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        q = apply_rotary(q, cosj, sinj)
        k = apply_rotary(k, cosj, sinj)
        logits = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.bfloat16
                            ) * jnp.bfloat16(scale)
        logits = logits + bias[:, None, None, :].astype(jnp.bfloat16)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                               ).astype(jnp.bfloat16)
        ctx = jnp.einsum("bhst,bthd->bshd", probs, v,
                         preferred_element_type=jnp.float32
                         ).astype(jnp.bfloat16)
        return ctx.reshape(B, S, H * hd)

    def fused_qkv(qkv_in):
        return fused_attention_qkv(qkv_in, c2, s2, bias, H, scale)

    def fused_hm(qkv_in):
        x = qkv_in.reshape(B, S, 3, H, hd)
        q = x[:, :, 0].transpose(0, 2, 1, 3)
        k = x[:, :, 1].transpose(0, 2, 1, 3)
        v = x[:, :, 2].transpose(0, 2, 1, 3)
        ctx = fused_attention(q, k, v, c2, s2, bias, scale)
        return ctx.transpose(0, 2, 1, 3).reshape(B, S, H * hd)

    cases = []
    for name, fn in (("xla_bf16", xla_chain), ("fused_qkv", fused_qkv),
                     ("fused_hm", fused_hm)):
        try:
            j = jax.jit(fn)
            out = j(qkv)
            _force(out)
            cases.append((name, j, out))
            print("compiled", name, flush=True)
        except Exception as e:
            print("FAILED", name, type(e).__name__, str(e)[:300], flush=True)

    ref = np.asarray(cases[0][2], np.float32)
    for name, _, out in cases[1:]:
        o = np.asarray(out, np.float32)
        cossim = (ref * o).sum() / (np.linalg.norm(ref) * np.linalg.norm(o))
        print(f"cos({name}, xla) = {cossim:.7f}", flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    dummy = jnp.ones((8, 8), jnp.float32)
    best = {n: 1e9 for n, _, _ in cases}
    sync = 1e9
    for rnd in range(4):
        out = tiny(dummy); np.asarray(jax.device_get(out))
        t0 = time.perf_counter()
        for _ in range(12):
            out = tiny(dummy)
        np.asarray(jax.device_get(out))
        sync = min(sync, (time.perf_counter() - t0) / 12)
        for n, fn, _ in cases:
            out = fn(qkv)
            _force(out)
            t0 = time.perf_counter()
            for _ in range(24):
                out = fn(qkv)
            _force(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / 24)
        print(f"round {rnd} sync={sync*1e3:.2f}: " + " | ".join(
            f"{n}: {best[n]*1e3:.2f}" for n, _, _ in cases), flush=True)
    for n, _, _ in cases:
        print(f"{n:>10s}: {(best[n]-sync)*1e3:7.2f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
