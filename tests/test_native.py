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
