"""Static block (contiguous) partitioning of a row range across shards.

Capability parity with the reference's load balancer
(reference: src/mpi_helpers/load_balance.rs:8-49 — ``RankInterval``,
``interval_by_rank``, ``slice_by_rank``): shard ``s`` of ``S`` owns rows
``[s*ceil(N/S), min((s+1)*ceil(N/S), N))``.

Bug fixed by design (SURVEY.md §2): when ``S > N`` the reference forces
``per_rank = 1`` and a non-last rank can end up with ``start > N`` and
``end = N < start``, which underflows ``get_count`` — callers had to guard
with ``rank >= files.len()`` (src/mpi_helpers/tasks.rs:63) and the search path
had no guard at all (src/mpi_helpers/metrics.rs:27). Here every (shard, N)
combination yields a valid, possibly empty, interval and the intervals always
tile ``[0, N)`` exactly.

On device, the same block layout is expressed as a
``NamedSharding(mesh, P("data", None))`` over a row-padded array — this module
is the host-side bookkeeping for global-index translation, exactly the
``global_idx = start_index + i`` discipline of the reference
(src/mpi_helpers/metrics.rs:41).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, TypeVar

T = TypeVar("T")


@dataclass(frozen=True)
class BlockInterval:
    """Half-open row interval owned by one shard
    (reference: src/mpi_helpers/load_balance.rs:8-17)."""

    start: int
    end: int

    @property
    def count(self) -> int:
        return self.end - self.start


def block_interval(shard: int, num_shards: int, count: int) -> BlockInterval:
    """The rows shard ``shard`` of ``num_shards`` owns out of ``count``
    (reference: src/mpi_helpers/load_balance.rs:24-42, with the S>N edge case
    fixed — see module docstring)."""
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    if not 0 <= shard < num_shards:
        raise ValueError(f"shard {shard} out of range for {num_shards} shards")
    if count < 0:
        raise ValueError(f"count must be non-negative, got {count}")
    per_shard = -(-count // num_shards) if count else 0  # ceil div
    start = min(shard * per_shard, count)
    end = count if shard == num_shards - 1 else min(start + per_shard, count)
    return BlockInterval(start, end)


def slice_for_shard(shard: int, num_shards: int, items: Sequence[T]) -> List[T]:
    """The contiguous sub-list shard ``shard`` owns
    (reference: src/mpi_helpers/load_balance.rs:44-49)."""
    iv = block_interval(shard, num_shards, len(items))
    return list(items[iv.start : iv.end])


def shard_sizes(num_shards: int, count: int) -> List[int]:
    """Row count per shard; sums to ``count`` for every combination."""
    return [block_interval(s, num_shards, count).count for s in range(num_shards)]


def pad_to_multiple(n: int, multiple: int) -> int:
    """Smallest m >= n with m % multiple == 0 (and m >= multiple so every
    device owns at least one tile). Used to pad store rows so a block-sharded
    ``jax.Array`` has equal-size per-device shards."""
    if multiple <= 0:
        raise ValueError(f"multiple must be positive, got {multiple}")
    return max(multiple, -(-n // multiple) * multiple)
