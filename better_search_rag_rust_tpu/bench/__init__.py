"""Benchmark subsystem (reference: src/mpi_helpers/benchmark.rs)."""

from .harness import (  # noqa: F401
    BenchmarkManager,
    BenchmarkTiming,
    format_time,
    time_operation,
)
