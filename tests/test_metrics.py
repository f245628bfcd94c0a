"""Distance + IR metric tests (modeled on reference: src/metrics.rs:167-318)."""

import numpy as np
import pytest

from better_search_rag_rust_tpu.metrics import (
    accuracy_metrics_for_query,
    cosine_distance,
    mean_reciprocal_rank,
    mean_reciprocal_rank_by_vectors,
    recall_at_k,
    recall_at_k_by_vectors,
    top_k_overlap,
    top_k_overlap_by_vectors,
    vectors_are_identical,
)
from better_search_rag_rust_tpu.utils.testing import mock_embeddings


# -- cosine_distance edge cases (reference: src/metrics.rs:143-165) -----------


def test_cosine_identical_is_zero():
    v = [0.3, -0.2, 0.9]
    assert cosine_distance(v, v) == 0.0


def test_cosine_length_mismatch_is_one():
    assert cosine_distance([1.0, 0.0], [1.0, 0.0, 0.0]) == 1.0


def test_cosine_empty_is_one():
    assert cosine_distance([], []) == 1.0


def test_cosine_zero_magnitude_is_one():
    assert cosine_distance([0.0, 0.0], [1.0, 0.0]) == 1.0


def test_cosine_orthogonal():
    assert cosine_distance([1.0, 0.0], [0.0, 1.0]) == pytest.approx(1.0)


def test_cosine_opposite_is_two():
    assert cosine_distance([1.0, 0.0], [-1.0, 0.0]) == pytest.approx(2.0)


def test_vectors_are_identical_tolerance():
    a = np.array([1.0, 2.0], dtype=np.float32)
    assert vectors_are_identical(a, a + 1e-12)
    assert not vectors_are_identical(a, a + 1e-3)


# -- index-based batch metrics -------------------------------------------------


def test_mrr_perfect():
    # every query's relevant doc ranked first => MRR 1.0
    # (reference: src/metrics.rs:172-190)
    relevant = [0, 1, 2]
    results = [[0, 5, 6], [1, 7, 8], [2, 9, 10]]
    assert mean_reciprocal_rank(relevant, results) == pytest.approx(1.0)


def test_mrr_mixed_ranks():
    # ranks 1, 2, 3 and one miss of list length 3 => (1 + 1/2 + 1/3 + 1/4)/4
    # missing => rank len+1 (reference: src/metrics.rs:50-53,193-222)
    relevant = [0, 1, 2, 3]
    results = [[0, 9, 9], [9, 1, 9], [9, 9, 2], [9, 9, 9]]
    expected = (1.0 + 0.5 + 1.0 / 3.0 + 0.25) / 4.0
    assert mean_reciprocal_rank(relevant, results) == pytest.approx(expected)


def test_mrr_empty_and_mismatched():
    assert mean_reciprocal_rank([], []) == 0.0
    assert mean_reciprocal_rank([0], [[0], [1]]) == 0.0


def test_recall_staircase():
    # relevant ranked at positions 1, 2, 3 across three queries
    # (reference: src/metrics.rs:224-269)
    relevant = [0, 1, 2]
    results = [[0, 8, 9], [8, 1, 9], [8, 9, 2]]
    assert recall_at_k(relevant, results, 1) == pytest.approx(1 / 3)
    assert recall_at_k(relevant, results, 2) == pytest.approx(2 / 3)
    assert recall_at_k(relevant, results, 3) == pytest.approx(1.0)
    assert recall_at_k(relevant, results, 5) == pytest.approx(1.0)


def test_top_k_overlap_partial():
    # 4 of 5 shared => 0.8 (reference: src/metrics.rs:271-317)
    seq = [[0, 1, 2, 3, 4]]
    par = [[0, 1, 2, 3, 9]]
    assert top_k_overlap(seq, par, 5) == pytest.approx(0.8)


def test_top_k_overlap_exact_is_one():
    seq = [[3, 1, 2], [5, 6, 7]]
    par = [[3, 1, 2], [5, 6, 7]]
    assert top_k_overlap(seq, par, 3) == pytest.approx(1.0)


def test_top_k_overlap_order_insensitive():
    assert top_k_overlap([[0, 1, 2]], [[2, 0, 1]], 3) == pytest.approx(1.0)


# -- vector-identity parity API (reference semantics) --------------------------


def test_by_vectors_metrics_match_index_metrics():
    vecs = mock_embeddings(10, dim=16, seed=3)
    queries_idx = [0, 4, 7]
    results_idx = [[0, 1, 2], [3, 4, 5], [8, 9, 6]]  # ranks 1, 2, miss
    queries_v = [vecs[i] for i in queries_idx]
    results_v = [[vecs[j] for j in row] for row in results_idx]

    assert mean_reciprocal_rank_by_vectors(queries_v, results_v) == pytest.approx(
        mean_reciprocal_rank(queries_idx, results_idx)
    )
    for k in (1, 2, 3):
        assert recall_at_k_by_vectors(queries_v, results_v, k) == pytest.approx(
            recall_at_k(queries_idx, results_idx, k)
        )
    seq_idx = [[0, 1, 2]]
    par_idx = [[1, 2, 9]]
    seq_v = [[vecs[j] for j in row] for row in seq_idx]
    par_v = [[vecs[j] for j in row] for row in par_idx]
    assert top_k_overlap_by_vectors(seq_v, par_v, 3) == pytest.approx(
        top_k_overlap(seq_idx, par_idx, 3)
    )


# -- single-query accuracy report (reference: src/mpi_helpers/metrics.rs:217-249)


def test_accuracy_metrics_found_first():
    results = [(0, 0.0), (3, 0.1), (7, 0.2)]
    assert accuracy_metrics_for_query(results, 0, 3) == (1.0, 1.0, 1.0)


def test_accuracy_metrics_found_later():
    results = [(3, 0.0), (0, 0.1), (7, 0.2)]
    mrr, recall, overlap = accuracy_metrics_for_query(results, 0, 3)
    assert mrr == pytest.approx(0.5)
    assert recall == 1.0
    assert overlap == 1.0


def test_accuracy_metrics_missing():
    results = [(3, 0.0), (5, 0.1)]
    assert accuracy_metrics_for_query(results, 0, 2) == (0.0, 0.0, 0.0)
