#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line.

Runs the BASELINE.json headline config (1M synthetic 768-d vectors,
1024-query batch, top-100, bf16 scoring with f32 accumulation) through the
exact sharded search engine on whatever devices are visible (the real TPU
chip under the driver; override the suite with BENCH_SUITE).

The reference publishes no absolute numbers (BASELINE.md), so ``vs_baseline``
is engine queries/sec divided by 24x an in-process-measured NumPy serial scan
— a linear-scaling stand-in for the reference's 24-rank c6i.24xlarge MPI
config. recall_at_10 is included as the exactness sanity (must be 1.0).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    # Default = the time-boxed battery: the search_1m headline keys (same
    # metric/value as before) PLUS per-suite sub-objects under "battery"
    # (int8 configs, encode, serve) so the driver artifact captures the
    # breadth, not just the headline. BENCH_SUITE selects a single suite.
    suite = os.environ.get("BENCH_SUITE", "battery")
    from better_search_rag_rust_tpu.bench.suite import run_suite

    result = run_suite(suite)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
