"""JabRef benchmark suite plumbing (corpus synthesis + the 3-config run)."""

import numpy as np

from better_search_rag_rust_tpu.bench.jabref import (
    run_jabref_suite,
    synthesize_jabref_corpus,
)


def test_synthesize_corpus_deterministic_and_idempotent(tmp_path):
    root = tmp_path / "jr"
    synthesize_jabref_corpus(root, files=40, seed=3)
    files = sorted(p.relative_to(root) for p in root.rglob("*.java"))
    assert len(files) == 40
    sample = (root / files[0]).read_text()
    assert sample.startswith("package org.jabref")
    # idempotent: a second call must not rewrite (mtimes preserved)
    mtimes = {f: (root / f).stat().st_mtime_ns for f in files}
    synthesize_jabref_corpus(root, files=40, seed=3)
    assert {f: (root / f).stat().st_mtime_ns for f in files} == mtimes
    # deterministic: a fresh tree has identical bytes
    root2 = tmp_path / "jr2"
    synthesize_jabref_corpus(root2, files=40, seed=3)
    assert (root2 / files[0]).read_text() == sample


def test_jabref_suite_small_end_to_end(tmp_path, monkeypatch):
    """The full 3-config suite on a scaled-down corpus: exactness fields
    must be perfect and the speedup hook must reach the report."""
    import better_search_rag_rust_tpu.bench.jabref as jb

    monkeypatch.setattr(jb, "JABREF_FILES", 24)
    corpus = tmp_path / "corpus"
    synthesize_jabref_corpus(corpus, files=24, seed=1)
    result = run_jabref_suite(
        corpus_dir=str(corpus), work_dir=str(tmp_path / "work"),
        queries_n=16, top_k=10,
    )
    assert result["files"] == 24
    assert result["rows"] == 24
    assert result["recall_at_10"] == 1.0
    assert result["oracle_overlap"] == 1.0
    assert result["report_has_speedup"]
    assert result["encoder"]  # labeled (hash backend in hermetic runs)
    assert result["value"] > 0 and result["serial_qps"] > 0
