"""Ingest tokenizer-shadow measurement on the REAL-tokenizer path
(VERDICT r4 #6).

The composed nomic ingest trails forward-only encode by ~26% (838-841 vs
1132 files/s), attributed to "tokenizer GIL shadow + dispatch". The
hermetic HashingTokenizer already has a GIL-free C++ fast path for ASCII
batches (native/bsr_tokenize.cpp), but the REAL-checkpoint path tokenizes
through HF ``tokenizers`` (FixedLengthTokenizer) — this script measures,
host-only (no chip needed):

  1. solo throughput (files/s at B=256, ~4 KB JabRef-shaped java files,
     512-token truncation+padding) for: FixedLengthTokenizer over a
     realistic 30k-vocab WordPiece, HashingTokenizer (native C++ path),
     HashingTokenizer (pure-Python path, forced via a non-ASCII char);
  2. the GIL shadow each imposes on a concurrent Python thread (the
     ingest pipeline's dispatch thread): a busy counter thread's rate
     during tokenization vs idle. HF tokenizers releases the GIL inside
     ``encode_batch`` (and parallelizes in Rust), so the expected result
     is shadow ~0 for FixedLength and ~100% for the pure-Python hash
     path.

If FixedLength shadows ~0 at >> 1132 files/s, the real-tokenizer composed
pipeline has NO tokenizer bottleneck and the residual composed-ingest gap
is dispatch cadence — recorded as the conclusion of VERDICT #6 (the fix
for the hermetic path is the already-shipped C++ tokenizer).

Usage: python scripts/proto_r5_tok.py [batches=8]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B = 256


def build_wordpiece(path: str, vocab_size: int = 30522) -> str:
    """Realistic WordPiece tokenizer.json: full BERT-style alphabet +
    synthetic subword vocab, lowercase normalizer, CLS/SEP template."""
    from tokenizers import Tokenizer, normalizers, pre_tokenizers
    from tokenizers.models import WordPiece
    from tokenizers.processors import TemplateProcessing

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4}
    # single chars (whole-word + continuation)
    chars = [chr(c) for c in range(33, 127)]
    for c in chars:
        vocab.setdefault(c, len(vocab))
    for c in chars:
        vocab.setdefault(f"##{c}", len(vocab))
    # synthetic multi-char pieces: deterministic letter n-grams
    rng = np.random.default_rng(0)
    letters = "abcdefghijklmnopqrstuvwxyz"
    while len(vocab) < vocab_size:
        n = int(rng.integers(2, 8))
        piece = "".join(rng.choice(list(letters), n))
        if rng.random() < 0.5:
            piece = "##" + piece
        vocab.setdefault(piece, len(vocab))
    tok = Tokenizer(WordPiece(vocab, unk_token="[UNK]",
                              max_input_chars_per_word=100))
    tok.normalizer = normalizers.Lowercase()
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = TemplateProcessing(
        single="[CLS] $A [SEP]",
        special_tokens=[("[CLS]", 2), ("[SEP]", 3)],
    )
    tok.save(path)
    return path


def corpus_texts() -> list:
    from better_search_rag_rust_tpu.bench.jabref import (
        synthesize_jabref_corpus,
    )

    tmp = tempfile.mkdtemp(prefix="bsr_tok_")
    root = synthesize_jabref_corpus(os.path.join(tmp, "jab"), files=B)
    texts = []
    for p in sorted(root.rglob("*.java")):
        texts.append(p.read_text())
    sizes = [len(t) for t in texts]
    print(f"corpus: {len(texts)} files, mean {np.mean(sizes):.0f} B,"
          f" p90 {np.percentile(sizes, 90):.0f} B", flush=True)
    return texts


class Counter(threading.Thread):
    """Busy pure-Python loop standing in for the dispatch thread."""

    def __init__(self):
        super().__init__(daemon=True)
        self.n = 0
        self.stop = False

    def run(self):
        n = 0
        while not self.stop:
            n += 1
            if n % 4096 == 0:
                self.n = n
        self.n = n


def rate_during(fn, seconds_min: float = 0.8) -> tuple:
    """(tokenize files/s, counter rate during) for repeated fn() calls."""
    c = Counter()
    c.start()
    time.sleep(0.05)
    t0 = time.perf_counter()
    n0 = c.n
    files = 0
    while time.perf_counter() - t0 < seconds_min:
        fn()
        files += B
    dt = time.perf_counter() - t0
    n1 = c.n
    c.stop = True
    c.join()
    return files / dt, (n1 - n0) / dt


def idle_rate(seconds: float = 0.8) -> float:
    c = Counter()
    c.start()
    time.sleep(0.05)
    t0 = time.perf_counter()
    n0 = c.n
    time.sleep(seconds)
    n1 = c.n
    c.stop = True
    c.join()
    return (n1 - n0) / (time.perf_counter() - t0)


def main():
    from better_search_rag_rust_tpu.models.tokenizer import (
        FixedLengthTokenizer, HashingTokenizer,
    )

    texts = corpus_texts()
    texts_nonascii = [t + " ümlaut" for t in texts]  # forces python path

    tok_path = build_wordpiece(
        os.path.join(tempfile.mkdtemp(prefix="bsr_tokjson_"),
                     "tokenizer.json"))
    real = FixedLengthTokenizer.from_file(tok_path, 512,
                                          add_special_tokens=True)
    hash_n = HashingTokenizer(max_tokens=512)
    hash_p = HashingTokenizer(max_tokens=512)

    # sanity: native path actually engaged for the ASCII batch?
    from better_search_rag_rust_tpu.native.tokenize import (
        encode_batch_native,
    )

    native_ok = encode_batch_native(texts[:2], 512, 30528) is not None
    print(f"native hash path available: {native_ok}", flush=True)

    idle = idle_rate()
    print(f"idle counter rate: {idle/1e6:.1f} M/s", flush=True)

    cells = [
        ("real_wordpiece", lambda: real.encode_batch(texts)),
        ("hash_native", lambda: hash_n.encode_batch(texts)),
        ("hash_python", lambda: hash_p.encode_batch(texts_nonascii)),
    ]
    out = {}
    for name, fn in cells:
        fn()  # warm (memo caches, rayon pool)
        fps_list, shadow_list = [], []
        for _ in range(3):
            fps, during = rate_during(fn)
            fps_list.append(fps)
            shadow_list.append(1.0 - during / idle)
        fps = max(fps_list)
        shadow = min(shadow_list)
        out[name] = (fps, shadow)
        print(f"{name:16s} {fps:8.0f} files/s   GIL shadow "
              f"{100*shadow:5.1f}%", flush=True)

    print(json.dumps({k: {"files_per_sec": round(v[0], 1),
                          "gil_shadow_pct": round(100 * v[1], 1)}
                      for k, v in out.items()}), flush=True)
    fps_real, shadow_real = out["real_wordpiece"]
    if fps_real > 2000 and shadow_real < 0.15:
        print("CONCLUSION: real-tokenizer path is GIL-free and faster than "
              "the forward (1132 files/s) — no tokenizer bottleneck on the "
              "real-checkpoint composed pipeline; residual composed gap is "
              "dispatch cadence.", flush=True)
    else:
        print("CONCLUSION: real tokenizer shadows the pipeline — move "
              "tokenization to a worker process or extend the C++ path.",
              flush=True)


if __name__ == "__main__":
    main()
