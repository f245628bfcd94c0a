"""Tokenization with the reference's fixed-shape contract.

The reference tokenizes with truncation AND fixed right-padding to 512
(pad_id 0), producing ``[B, 512]`` id/mask tensors (reference:
src/llm/hf.rs:59-106 — ``PaddingStrategy::Fixed(512)`` at :70, pad_id 0 at
:71, truncation at :62-67). That accidental rigidity is exactly what XLA
wants — one static shape, one compile.

Two backends:

* :class:`FixedLengthTokenizer` — wraps a real HF ``tokenizers.Tokenizer``
  (``tokenizer.json`` from a local checkpoint export).
* :class:`HashingTokenizer` — hermetic deterministic fallback: word-level
  hashing into the vocab range. No artifacts needed; used by tests and by the
  hash encoder (≙ the reference's mock-embedding trick, src/utils.rs:14-27).
"""

from __future__ import annotations

import hashlib
import re
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

PAD_ID = 0  # reference: src/llm/hf.rs:71
_WORD_RE = re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")


class TokenizerError(ValueError):
    pass


def _check_batch(texts: Sequence[str]) -> None:
    """Reject batches containing empty strings — the reference's
    "Invalid inputs: has empty values" contract (src/llm/hf.rs:54-56)."""
    if any(len(t) == 0 for t in texts):
        raise TokenizerError("Invalid inputs: has empty values")


class FixedLengthTokenizer:
    """HF tokenizer with truncation + fixed right-padding to ``max_tokens``.

    ``add_special_tokens`` defaults to **False** for parity: the reference
    encodes with ``encode_batch(texts, false)`` (src/llm/hf.rs:83), i.e. no
    [CLS]/[SEP] — its embeddings are produced from the bare token stream.
    Pass True for the checkpoint's canonical usage (nomic-embed expects
    special tokens); the choice changes every embedding, so it is pinned
    here rather than left to the backend default.
    """

    def __init__(self, tokenizer, max_tokens: int = 512,
                 add_special_tokens: bool = False):
        self.max_tokens = max_tokens
        self.add_special_tokens = add_special_tokens
        self._tok = tokenizer
        # stride=0 windows + overflow encodings power the long-document
        # multi-window mode (see encode_batch_windows).
        self._tok.enable_truncation(max_length=max_tokens)
        self._tok.enable_padding(
            length=max_tokens, pad_id=PAD_ID, pad_token="[PAD]"
        )

    @staticmethod
    def from_file(
        path: str | Path, max_tokens: int = 512,
        add_special_tokens: bool = False,
    ) -> "FixedLengthTokenizer":
        from tokenizers import Tokenizer

        return FixedLengthTokenizer(
            Tokenizer.from_file(str(path)), max_tokens, add_special_tokens
        )

    def encode_batch(
        self, texts: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """``texts -> (ids [B, S] int32, mask [B, S] int32)``. Empty batch ->
        ``[0, S]`` arrays (reference: src/llm/hf.rs:51-53)."""
        if len(texts) == 0:
            z = np.zeros((0, self.max_tokens), dtype=np.int32)
            return z, z.copy()
        _check_batch(texts)
        encs = self._tok.encode_batch(
            list(texts), add_special_tokens=self.add_special_tokens
        )
        ids = np.asarray([e.ids for e in encs], dtype=np.int32)
        mask = np.asarray([e.attention_mask for e in encs], dtype=np.int32)
        return ids, mask

    def encode_batch_windows(
        self, texts: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Long-document windowing: every text becomes >= 1 fixed-shape
        window covering ALL its tokens (the head window plus the tokenizer's
        overflow encodings). Returns ``(ids [W, S], mask [W, S],
        group [W])`` where ``group[w]`` is the source text index."""
        if len(texts) == 0:
            z = np.zeros((0, self.max_tokens), dtype=np.int32)
            return z, z.copy(), np.zeros((0,), dtype=np.int64)
        _check_batch(texts)
        ids_rows, mask_rows, groups = [], [], []
        encs = self._tok.encode_batch(
            list(texts), add_special_tokens=self.add_special_tokens
        )
        for i, enc in enumerate(encs):
            for window in [enc, *enc.overflowing]:
                ids_rows.append(window.ids)
                mask_rows.append(window.attention_mask)
                groups.append(i)
        return (
            np.asarray(ids_rows, dtype=np.int32),
            np.asarray(mask_rows, dtype=np.int32),
            np.asarray(groups, dtype=np.int64),
        )


class HashingTokenizer:
    """Deterministic, artifact-free tokenizer.

    Splits text into words/punctuation and hashes each token into
    ``[num_special, vocab_size)`` with a stable digest, so identical text
    always yields identical ids on every host. ids 0..9 are reserved
    (0 = PAD, 1 = CLS, 2 = SEP).
    """

    NUM_SPECIAL = 10
    CLS_ID = 1
    SEP_ID = 2

    #: token -> id memo cap; natural-language/code corpora repeat words
    #: heavily, so memoization cuts encode_batch ~3x (measured 136 -> 45 ms
    #: per 256 docs). Bounded so adversarial unique-token streams cannot
    #: grow memory without limit.
    MAX_CACHE = 1 << 20

    def __init__(self, vocab_size: int = 30528, max_tokens: int = 512):
        self.vocab_size = vocab_size
        self.max_tokens = max_tokens
        self._id_cache: dict = {}

    def _token_id(self, token: str) -> int:
        tid = self._id_cache.get(token)
        if tid is None:
            digest = hashlib.blake2b(
                token.encode("utf-8"), digest_size=8
            ).digest()
            span = self.vocab_size - self.NUM_SPECIAL
            tid = self.NUM_SPECIAL + int.from_bytes(digest, "little") % span
            if len(self._id_cache) >= self.MAX_CACHE:
                self._id_cache.clear()
            self._id_cache[token] = tid
        return tid

    def encode_batch(
        self, texts: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray]:
        if len(texts) == 0:
            z = np.zeros((0, self.max_tokens), dtype=np.int32)
            return z, z.copy()
        _check_batch(texts)
        s = self.max_tokens
        # GIL-free C++ fast path for all-ASCII batches (bitwise-identical
        # ids — same blake2b, same split; tests/test_native.py pins it).
        # Non-ASCII / NUL-bearing batches keep Python's Unicode semantics.
        from ..native.tokenize import encode_batch_native

        native = encode_batch_native(texts, s, self.vocab_size)
        if native is not None:
            return native
        ids = np.full((len(texts), s), PAD_ID, dtype=np.int32)
        mask = np.zeros((len(texts), s), dtype=np.int32)
        for row, text in enumerate(texts):
            words = _WORD_RE.findall(text.lower())[: s - 2]
            seq: List[int] = [self.CLS_ID]
            seq.extend(self._token_id(w) for w in words)
            seq.append(self.SEP_ID)
            ids[row, : len(seq)] = seq
            mask[row, : len(seq)] = 1
        return ids, mask

    def encode_batch_windows(
        self, texts: Sequence[str]
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Long-document windowing (see
        :meth:`FixedLengthTokenizer.encode_batch_windows`): word stream split
        into consecutive ``max_tokens - 2`` windows, CLS/SEP re-added."""
        if len(texts) == 0:
            z = np.zeros((0, self.max_tokens), dtype=np.int32)
            return z, z.copy(), np.zeros((0,), dtype=np.int64)
        _check_batch(texts)
        s = self.max_tokens
        body = s - 2
        ids_rows, mask_rows, groups = [], [], []
        for i, text in enumerate(texts):
            words = _WORD_RE.findall(text.lower())
            for start in range(0, max(len(words), 1), body):
                window = words[start : start + body]
                row = np.full((s,), PAD_ID, dtype=np.int32)
                m = np.zeros((s,), dtype=np.int32)
                seq = [self.CLS_ID, *(self._token_id(w) for w in window),
                       self.SEP_ID]
                row[: len(seq)] = seq
                m[: len(seq)] = 1
                ids_rows.append(row)
                mask_rows.append(m)
                groups.append(i)
        return (
            np.stack(ids_rows),
            np.stack(mask_rows),
            np.asarray(groups, dtype=np.int64),
        )


def load_tokenizer(
    checkpoint_dir: Optional[str],
    max_tokens: int = 512,
    vocab_size: int = 30528,
    add_special_tokens: bool = False,
):
    """``tokenizer.json`` under the checkpoint dir when available, else the
    hermetic hashing tokenizer — artifact-gated like the reference's model
    loading (src/llm/hf.rs:138-144)."""
    if checkpoint_dir:
        tok_file = Path(checkpoint_dir) / "tokenizer.json"
        if tok_file.exists():
            return FixedLengthTokenizer.from_file(
                tok_file, max_tokens, add_special_tokens
            )
    return HashingTokenizer(vocab_size=vocab_size, max_tokens=max_tokens)
