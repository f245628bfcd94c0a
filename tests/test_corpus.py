"""Corpus I/O tests (modeled on reference: src/source.rs:51-231)."""

from pathlib import Path

from better_search_rag_rust_tpu.corpus import (
    find_files_by_extensions,
    read_file,
    read_files,
)


def _mk(tmp_path: Path, rel: str, content: str = "x") -> Path:
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(content)
    return p


def test_filter_single_extension(tmp_path):
    _mk(tmp_path, "a/Main.java")
    _mk(tmp_path, "a/b/Util.java")
    _mk(tmp_path, "a/readme.md")
    files = find_files_by_extensions(tmp_path, ["java"])
    assert [f.name for f in files] == ["Main.java", "Util.java"]


def test_filter_multiple_extensions(tmp_path):
    _mk(tmp_path, "x.java")
    _mk(tmp_path, "y.rs")
    _mk(tmp_path, "z.py")
    files = find_files_by_extensions(tmp_path, [".java", "rs"])
    assert sorted(f.suffix for f in files) == [".java", ".rs"]


def test_filter_no_match(tmp_path):
    _mk(tmp_path, "x.txt")
    assert find_files_by_extensions(tmp_path, ["java"]) == []


def test_empty_dir(tmp_path):
    assert find_files_by_extensions(tmp_path, ["java"]) == []


def test_empty_extension_list(tmp_path):
    # reference: src/source.rs tests :204-230 — empty set matches nothing
    _mk(tmp_path, "x.java")
    assert find_files_by_extensions(tmp_path, []) == []


def test_missing_root():
    assert find_files_by_extensions("/nonexistent/nowhere", ["java"]) == []


def test_deterministic_order(tmp_path):
    for name in ["b.java", "a.java", "c.java"]:
        _mk(tmp_path, name)
    files = find_files_by_extensions(tmp_path, ["java"])
    assert files == sorted(files)


def test_read_roundtrip(tmp_path):
    p = _mk(tmp_path, "f.java", "public class F {}\n")
    assert read_file(p) == "public class F {}\n"


def test_read_missing_file(tmp_path):
    assert read_file(tmp_path / "nope.java") is None


def test_read_oversized_rejected(tmp_path):
    # reference: src/source.rs:36-39 — >cap files yield None
    p = _mk(tmp_path, "big.java", "a" * 2048)
    assert read_file(p, max_bytes=1024) is None
    assert read_file(p, max_bytes=4096) is not None


def test_read_unicode(tmp_path):
    content = "// ünïcödé ❤ テスト\n"
    p = _mk(tmp_path, "u.java", content)
    assert read_file(p) == content


def test_read_files_batch_keeps_pairing(tmp_path):
    ok = _mk(tmp_path, "ok.java", "ok")
    missing = tmp_path / "missing.java"
    out = read_files([ok, missing])
    assert out[0] == (ok, "ok")
    assert out[1] == (missing, None)
