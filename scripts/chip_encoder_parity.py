"""On-hardware encoder numerics check: xla vs xla_bf16 vs fused.

Run after ANY attention/encoder kernel change (companion to
scripts/chip_exactness.py, which covers the search kernels). Asserts the
bf16-variant embeddings stay within cos > 0.999 of the f32-logit XLA
path on the real Mosaic lowering, including key-padding rows.

Usage: python scripts/chip_encoder_parity.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import numpy as np
from better_search_rag_rust_tpu.models.nomic import NomicBertConfig, NomicEncoder

cfg_x = NomicBertConfig(max_tokens=512, attention_impl="xla")
enc_x = NomicEncoder(cfg_x, seed=3)
enc_b = NomicEncoder(dataclasses.replace(cfg_x, attention_impl="xla_bf16"),
                     params=enc_x.params)
enc_f = NomicEncoder(dataclasses.replace(cfg_x, attention_impl="fused"),
                     params=enc_x.params)
rng = np.random.default_rng(5)
ids = rng.integers(1, 30000, size=(8, 512)).astype(np.int32)
mask = np.ones((8, 512), np.int32)
mask[0, 300:] = 0
mask[3, 17:] = 0
a = enc_x.encode_tokens(ids, mask)
b = enc_b.encode_tokens(ids, mask)
f = enc_f.encode_tokens(ids, mask)
for name, o in (("xla_bf16", b), ("fused", f)):
    cos = np.sum(a * o, axis=1)
    print(name, "cos vs xla min:", cos.min(), flush=True)
    assert cos.min() > 0.999, (name, cos)
print("CHIP PARITY OK")
