"""Block partitioning tests (reference: src/mpi_helpers/load_balance.rs).

Includes the S > N edge case the reference gets wrong (SURVEY.md §2: a
non-last rank could get end < start and underflow)."""

import pytest

from better_search_rag_rust_tpu.parallel import (
    block_interval,
    pad_to_multiple,
    shard_sizes,
    slice_for_shard,
)


def test_even_split():
    assert [
        (block_interval(s, 4, 8).start, block_interval(s, 4, 8).end)
        for s in range(4)
    ] == [(0, 2), (2, 4), (4, 6), (6, 8)]


def test_uneven_split_last_absorbs_remainder():
    # ceil(10/4)=3 => 3,3,3,1 (reference: load_balance.rs:24-42)
    assert shard_sizes(4, 10) == [3, 3, 3, 1]


@pytest.mark.parametrize("num_shards", [1, 2, 3, 5, 8, 13])
@pytest.mark.parametrize("count", [0, 1, 2, 5, 7, 8, 100, 2305])
def test_intervals_tile_exactly(num_shards, count):
    """Every (shards, rows) combination tiles [0, count) — including
    shards > rows, where the reference underflows."""
    cursor = 0
    for s in range(num_shards):
        iv = block_interval(s, num_shards, count)
        assert iv.start == cursor
        assert iv.end >= iv.start  # no underflow ever
        cursor = iv.end
    assert cursor == count


def test_more_shards_than_rows():
    # 3 rows over 8 shards: shards beyond the data get empty intervals
    sizes = shard_sizes(8, 3)
    assert sum(sizes) == 3
    assert all(sz >= 0 for sz in sizes)


def test_slice_for_shard():
    items = list(range(10))
    assert slice_for_shard(0, 3, items) == [0, 1, 2, 3]
    assert slice_for_shard(2, 3, items) == [8, 9]


def test_slice_for_shard_empty():
    assert slice_for_shard(5, 8, [1, 2]) == []


def test_invalid_args():
    with pytest.raises(ValueError):
        block_interval(0, 0, 10)
    with pytest.raises(ValueError):
        block_interval(3, 3, 10)
    with pytest.raises(ValueError):
        block_interval(0, 2, -1)


def test_pad_to_multiple():
    assert pad_to_multiple(100, 128) == 128
    assert pad_to_multiple(128, 128) == 128
    assert pad_to_multiple(129, 128) == 256
    assert pad_to_multiple(0, 128) == 128  # every device owns >= one tile
    with pytest.raises(ValueError):
        pad_to_multiple(5, 0)
