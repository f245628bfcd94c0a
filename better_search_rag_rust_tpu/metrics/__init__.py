from .quality import (  # noqa: F401
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
