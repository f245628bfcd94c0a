"""Native C++ corpus loader: must agree exactly with the pure-Python walker
(reference semantics: src/source.rs:8-49)."""

import numpy as np
import pytest

from better_search_rag_rust_tpu.corpus import walker
from better_search_rag_rust_tpu.native import corpus as native_corpus


@pytest.fixture(scope="module")
def native_ok():
    if not native_corpus.available():
        pytest.skip("native toolchain unavailable")
    return True


@pytest.fixture()
def tree(tmp_path):
    (tmp_path / "a" / "b").mkdir(parents=True)
    (tmp_path / "a" / "X.java").write_text("class X {}")
    (tmp_path / "a" / "b" / "Y.java").write_text("class Y {}")
    (tmp_path / "a" / "b" / "z.py").write_text("pass")
    (tmp_path / "a" / "README.md").write_text("docs")
    (tmp_path / "big.java").write_text("x" * 4096)
    (tmp_path / "uni.java").write_text("híjklmnö ☃")
    return tmp_path


def test_walk_matches_python(native_ok, tree):
    py = walker.find_files_by_extensions(tree, ["java"])
    nat = native_corpus.find_files_by_extensions(tree, ["java"])
    assert [str(p) for p in nat] == [str(p) for p in py]


def test_walk_dot_prefix_and_empty(native_ok, tree):
    assert native_corpus.find_files_by_extensions(tree, [".py"]) == \
        walker.find_files_by_extensions(tree, ["py"])
    assert native_corpus.find_files_by_extensions(tree, []) in ([], None)
    assert native_corpus.find_files_by_extensions(tree / "nope", ["java"]) == []


def test_read_files_matches_python(native_ok, tree):
    paths = walker.find_files_by_extensions(tree, ["java", "py", "md"])
    nat = native_corpus.read_files(paths, max_bytes=10 * 1024 * 1024)
    py = [(p, walker.read_file(p)) for p in paths]
    assert [(str(a), b) for a, b in nat] == [(str(a), b) for a, b in py]


def test_read_files_size_cap(native_ok, tree):
    # >cap reads yield None (reference: src/source.rs:36-39)
    nat = native_corpus.read_files([tree / "big.java"], max_bytes=100)
    assert nat[0][1] is None
    nat = native_corpus.read_files([tree / "missing.java"], max_bytes=100)
    assert nat[0][1] is None


def test_read_files_unicode(native_ok, tree):
    nat = native_corpus.read_files([tree / "uni.java"], max_bytes=1 << 20)
    assert nat[0][1] == "híjklmnö ☃"


def test_walker_dispatches_to_native(native_ok, tree):
    """corpus.walker.read_files uses the native path when available and the
    result is indistinguishable from pure Python."""
    paths = walker.find_files_by_extensions(tree, ["java"])
    out = walker.read_files(paths)
    assert all(c is not None for _p, c in out if _p.name != "missing")
    assert walker._native_reader() is not None


def test_many_files_threaded(native_ok, tmp_path):
    for i in range(200):
        (tmp_path / f"f{i}.java").write_text(f"class F{i} {{}}")
    paths = walker.find_files_by_extensions(tmp_path, ["java"])
    out = native_corpus.read_files(paths, max_bytes=1 << 20)
    assert len(out) == 200
    assert all(c == f"class F{p.stem[1:]} {{}}" for p, c in out)


# ---------------------------------------------------------------------------
# Native hashing tokenizer (bsr_tokenize.cpp)
# ---------------------------------------------------------------------------


def test_native_tokenizer_bitwise_matches_python(native_ok):
    """The C++ tokenizer must produce BITWISE-identical (ids, mask) to the
    pure-Python HashingTokenizer on adversarial ASCII inputs — same blake2b
    ids, same word split, same whitespace set, same truncation."""
    import random
    import string

    from better_search_rag_rust_tpu.models.tokenizer import (
        _WORD_RE, HashingTokenizer)
    from better_search_rag_rust_tpu.native.tokenize import (
        available, encode_batch_native)

    if not available():
        pytest.skip("native tokenizer unavailable")

    tok = HashingTokenizer(vocab_size=30528, max_tokens=48)
    rng = random.Random(0)
    alphabet = (string.ascii_letters + string.digits +
                " \t\n_()[]{};:.,!@#$%^&*-+=<>/?~`'\"|\\" +
                "\x1c\x1d\x1e\x1f\x0b\x0c\r")
    texts = ["x"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 300)))
        for _ in range(100)
    ]
    nat = encode_batch_native(texts, 48, 30528)
    assert nat is not None
    ids = np.zeros((len(texts), 48), dtype=np.int32)
    mask = np.zeros((len(texts), 48), dtype=np.int32)
    for row, text in enumerate(texts):
        words = _WORD_RE.findall(text.lower())[:46]
        seq = [1] + [tok._token_id(w) for w in words] + [2]
        ids[row, : len(seq)] = seq
        mask[row, : len(seq)] = 1
    np.testing.assert_array_equal(nat[0], ids)
    np.testing.assert_array_equal(nat[1], mask)


def test_native_tokenizer_rejects_non_ascii_and_nul(native_ok):
    """Non-ASCII or NUL-bearing batches must route back to Python (None),
    preserving Unicode lowercase/whitespace semantics."""
    from better_search_rag_rust_tpu.native.tokenize import (
        available, encode_batch_native)

    if not available():
        pytest.skip("native tokenizer unavailable")
    assert encode_batch_native(["héllo"], 16, 30528) is None
    assert encode_batch_native(["a\x00b"], 16, 30528) is None


def test_hashing_tokenizer_dispatches_to_native(native_ok):
    """encode_batch output is identical whether or not the native path is
    available (the dispatch itself is covered by the bitwise test; this
    pins the integration point, incl. long-token and truncation cases)."""
    from better_search_rag_rust_tpu.models.tokenizer import HashingTokenizer
    from better_search_rag_rust_tpu.native import tokenize as nt

    tok = HashingTokenizer(vocab_size=1000, max_tokens=8)
    texts = ["one two three four five six seven eight nine",
             "a" * 500, "!@# $%^"]
    a_ids, a_mask = tok.encode_batch(texts)

    orig = nt.encode_batch_native
    try:
        nt.encode_batch_native = lambda *a, **k: None
        b_ids, b_mask = tok.encode_batch(texts)
    finally:
        nt.encode_batch_native = orig
    # the models.tokenizer module imports the function lazily per call, so
    # patching the source module is enough
    np.testing.assert_array_equal(a_ids, b_ids)
    np.testing.assert_array_equal(a_mask, b_mask)
