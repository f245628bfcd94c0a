"""Shared test fixtures (reference: src/utils.rs:1-36).

The reference's fake backend is "random vectors, not a fake model"
(src/utils.rs:14-27 — uniform(-1, 1) mock embeddings, DIMENSION=768). The same
trick is used here, made deterministic via an explicit seed.
"""

from __future__ import annotations

import numpy as np

#: reference: src/utils.rs:8
DIMENSION = 768


def mock_embedding(rng: np.random.Generator, dim: int = DIMENSION) -> np.ndarray:
    """One uniform(-1, 1) float32 vector (reference: src/utils.rs:14-20)."""
    return rng.uniform(-1.0, 1.0, size=(dim,)).astype(np.float32)


def mock_embeddings(
    n: int, dim: int = DIMENSION, seed: int = 0
) -> np.ndarray:
    """[n, dim] uniform(-1, 1) float32 matrix (reference: src/utils.rs:22-27)."""
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32)


def sample_store(store, n: int, dim: int = DIMENSION, seed: int = 0):
    """Seed a vector store with n mock embeddings
    (reference: src/utils.rs:30-35)."""
    store.append_many(mock_embeddings(n, dim, seed))
    return store
