"""Model parameter checkpointing (Orbax).

The reference's only model artifact is an offline ONNX export
(reference: environment.yaml:8-11, run-slurm.sh:27-32); there is no way to
persist a modified model because nothing can modify one. With the
contrastive trainer (:mod:`.train`) the framework can, so params get a real
checkpoint story: Orbax, which writes sharding-aware, multi-host-safe
checkpoints (each host writes its own shards — the same discipline as the
vector store).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax


_CKPT = None


def _checkpointer():
    """Singleton — Orbax checkpointers own async executors whose teardown on
    garbage collection can break a subsequent instance's event loop."""
    global _CKPT
    if _CKPT is None:
        import orbax.checkpoint as ocp

        _CKPT = ocp.StandardCheckpointer()
    return _CKPT


def save_params(path: str | os.PathLike, params: Any) -> None:
    """Write a param tree (sharded arrays welcome) to ``path``. Blocks until
    the (async) checkpointer has committed the files."""
    path = Path(path).absolute()
    ckpt = _checkpointer()
    ckpt.save(path, params, force=True)
    wait = getattr(ckpt, "wait_until_finished", None)
    if wait is not None:
        wait()


def load_params(path: str | os.PathLike, like: Optional[Any] = None) -> Any:
    """Read a param tree. ``like`` (a tree of arrays or ShapeDtypeStruct,
    e.g. a freshly initialized model) restores with matching shardings;
    without it, arrays arrive host-local."""
    path = Path(path).absolute()
    if like is not None:
        import orbax.checkpoint as ocp

        targets = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x), like
        )
        return _checkpointer().restore(path, targets)
    return _checkpointer().restore(path)
