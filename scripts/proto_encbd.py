"""Encode-forward cost decomposition (B=256, S=512, chip).

The encode suite sits at MFU 0.51 (~320 ms/batch). Candidates for the
missing time: the [B,H,S,S] logits/probs HBM round-trips, the dh=64
QK/AV matmuls (half-depth MXU contractions), rotary, LayerNorms.
This times monkeypatched forwards that cut one stage at a time:

  full      — production xla_bf16 attention
  noattn    — qkv+rotary kept (barrier'd), QK/softmax/AV/out_proj skipped
  norot     — full attention, rotary skipped
  f32logit  — attention_impl="xla" (f32 logits) for reference

Usage: python scripts/proto_encbd.py
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

from better_search_rag_rust_tpu.models import nomic as N

B, S = 256, 512


def _sync(o) -> None:
    np.asarray(jax.device_get(o[:1, :1]))


def make_encoder(impl: str, attn_variant: str):
    orig = N.NomicAttention.__call__

    def patched(self, x, mask_bias, cos, sin, attention_mask=None):
        cfg = self.config
        b, s, d = x.shape
        h, hd = cfg.num_heads, cfg.head_dim
        import flax.linen as nn
        qkv = nn.Dense(3 * d, use_bias=cfg.qkv_bias, dtype=cfg.dtype,
                       name="Wqkv")(x)
        qkv = qkv.reshape(b, s, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if attn_variant != "norot":
            q = N.apply_rotary(q, cos, sin)
            k = N.apply_rotary(k, cos, sin)
        if attn_variant == "noattn":
            q, k, v = jax.lax.optimization_barrier((q, k, v))
            return v.reshape(b, s, d)
        logits = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.bfloat16
                            ) * jnp.bfloat16(1.0 / math.sqrt(hd))
        logits = logits + mask_bias.astype(jnp.bfloat16)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                               ).astype(cfg.dtype)
        ctx = jnp.einsum("bhst,bthd->bshd", probs, v,
                         preferred_element_type=jnp.float32).astype(cfg.dtype)
        ctx = ctx.reshape(b, s, d)
        return nn.Dense(d, use_bias=True, dtype=cfg.dtype,
                        name="out_proj")(ctx)

    if attn_variant in ("noattn", "norot"):
        N.NomicAttention.__call__ = patched
    try:
        cfg = N.NomicBertConfig(max_tokens=S, attention_impl=impl)
        enc = N.NomicEncoder(cfg)
        rng = np.random.default_rng(0)
        ids = rng.integers(1, cfg.vocab_size, size=(B, S)).astype(np.int32)
        mask = np.ones((B, S), np.int32)
        out = enc.encode_tokens_device(ids, mask)
        _sync(out)
        return enc, ids, mask
    finally:
        N.NomicAttention.__call__ = orig


def main():
    variants = [
        ("full", "xla_bf16", "full"),
        ("noattn", "xla_bf16", "noattn"),
        ("norot", "xla_bf16", "norot"),
        ("f32logit", "xla", "full"),
    ]
    encs = []
    for name, impl, va in variants:
        encs.append((name, *make_encoder(impl, va)))
        print("compiled", name, flush=True)

    tiny = jax.jit(lambda x: x[:1, :1] + 1.0)
    dummy = jnp.ones((8, 8), jnp.float32)
    best = {n: 1e9 for n, *_ in encs}
    sync = 1e9
    for rnd in range(3):
        out = tiny(dummy); _sync(out)
        t0 = time.perf_counter()
        for _ in range(8):
            out = tiny(dummy)
        _sync(out)
        sync = min(sync, (time.perf_counter() - t0) / 8)
        for n, enc, ids, mask in encs:
            out = enc.encode_tokens_device(ids, mask)
            _sync(out)
            t0 = time.perf_counter()
            for _ in range(6):
                out = enc.encode_tokens_device(ids, mask)
            _sync(out)
            best[n] = min(best[n], (time.perf_counter() - t0) / 6)
        print(f"round {rnd} sync={sync*1e3:.2f}: " + " | ".join(
            f"{n}: {best[n]*1e3:.1f}" for n, *_ in encs), flush=True)
    for n, *_ in encs:
        print(f"{n:>9s}: {(best[n]-sync)*1e3:8.1f} ms "
              f"({B/ (best[n]-sync):.0f} files/s)", flush=True)


if __name__ == "__main__":
    main()
