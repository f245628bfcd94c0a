"""Device-store snapshots: Orbax-backed fast serve-startup path.

Parquet (:mod:`.vectorstore`) is the canonical interchange format (parity
with the reference's store, src/vectorstore/polars.rs); this module adds a
TPU-native cache next to it: the *already normalized, padded, sharded*
``jax.Array`` checkpointed with Orbax, so a serving host restores straight
into HBM without re-parsing/normalizing/padding Parquet (measured ~13 s for
10M x 256 rows). Multi-host safe — each host writes/reads only its own
shards, the same discipline as :meth:`DeviceStore.from_parquet_sharded`.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.checkpoint import _checkpointer
from .device_store import DeviceStore

_META = "device_store.json"
_ARRAY = "data"


def save_device_store(
    cache_dir: str | os.PathLike,
    store: DeviceStore,
    source: Optional[dict] = None,
) -> None:
    """Snapshot a built :class:`DeviceStore` (array + layout metadata).

    ``source``: identity of the Parquet file this snapshot was built from
    (e.g. ``{"rows": N, "bytes": sz}``) — recorded so loaders can verify the
    snapshot still matches the store on disk instead of trusting mtimes
    (a restored-from-backup Parquet can carry an older mtime)."""
    cache_dir = Path(cache_dir).absolute()
    cache_dir.mkdir(parents=True, exist_ok=True)
    ckpt = _checkpointer()
    ckpt.save(cache_dir / _ARRAY, {"data": store.data}, force=True)
    # StandardCheckpointer is async: the array files must be committed
    # BEFORE the metadata marker below makes the snapshot look valid.
    wait = getattr(ckpt, "wait_until_finished", None)
    if wait is not None:
        wait()
    meta = {
        "num_rows": store.num_rows,
        "dim": store.dim,
        "per_device_rows": store.per_device_rows,
        "chunk": store.chunk,
        "matryoshka_from": store.matryoshka_from,
        "dtype": str(store.data.dtype),
        "shape": list(store.data.shape),
        "data_shards": int(store.mesh.shape["data"]),
        "source": source,
    }
    tmp = cache_dir / f"{_META}.{os.getpid()}.tmp"
    tmp.write_text(json.dumps(meta))
    os.replace(tmp, cache_dir / _META)


def load_device_store(
    cache_dir: str | os.PathLike, mesh: Mesh, data_axis: str = "data"
) -> DeviceStore:
    """Restore a snapshot as a block-sharded array over ``mesh``.

    The mesh may differ from the one that wrote the snapshot as long as its
    ``data``-axis size divides the padded rows evenly (Orbax reshards on
    restore) — the serve-on-M-hosts half of the store lifecycle.
    """
    cache_dir = Path(cache_dir).absolute()
    meta = json.loads((cache_dir / _META).read_text())
    shape = tuple(meta["shape"])
    n_shards = mesh.shape[data_axis]
    if shape[0] % n_shards:
        raise ValueError(
            f"snapshot rows {shape[0]} not divisible by mesh "
            f"data axis {n_shards}"
        )
    sharding = NamedSharding(mesh, P(data_axis, None))
    target = {
        "data": jax.ShapeDtypeStruct(
            shape, jnp.dtype(meta["dtype"]), sharding=sharding
        )
    }
    restored = _checkpointer().restore(cache_dir / _ARRAY, target)
    per_dev = shape[0] // n_shards
    # Resharding onto more shards can shrink per-device rows below the
    # recorded scan chunk; the scan kernels require chunk | per_device_rows.
    chunk = min(int(meta["chunk"]), per_dev)
    if per_dev % chunk:
        chunk = per_dev  # single-chunk scan is always valid
    return DeviceStore(
        data=restored["data"],
        mesh=mesh,
        num_rows=meta["num_rows"],
        dim=meta["dim"],
        per_device_rows=per_dev,
        chunk=chunk,
        matryoshka_from=meta["matryoshka_from"],
    )


def snapshot_exists(cache_dir: str | os.PathLike) -> bool:
    return (Path(cache_dir) / _META).exists()
