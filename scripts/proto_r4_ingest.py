"""Round-10 composed-ingest A/B: pipeline depth 2 (double-buffer, the
round-3 production setting) vs deeper in-flight windows (4 / 6) on the
REAL nomic forward — interleaved in ONE process (cross-process relay
drift makes separate runs non-decision-grade, CLAUDE.md).

Hypothesis (VERDICT r3 weak #6): the composed ingest's ~100 ms/batch gap
to the forward-only encode suite is mostly the relay's ~40 ms synchronous
per-batch readback; a deeper dispatch window keeps N forwards queued so
the readback of batch i-N overlaps device compute instead of stalling it.

Usage: python scripts/proto_r4_ingest.py [files=2048] [rounds=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from better_search_rag_rust_tpu.bench.suite import run_pipeline_suite

FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
DEPTHS = (2, 4, 6)


def main():
    # one throwaway run to pay the nomic compile before any timed cell
    run_pipeline_suite(files=256, backend="nomic", batch=256, inflight=2)
    best = {d: 0.0 for d in DEPTHS}
    for rnd in range(ROUNDS):
        for d in DEPTHS:
            out = run_pipeline_suite(files=FILES, backend="nomic",
                                     batch=256, inflight=d)
            best[d] = max(best[d], out["value"])
            print(f"round {rnd} depth {d}: {out['value']:.1f} files/s "
                  f"(elapsed {out['elapsed_s']}s)", flush=True)
    for d in DEPTHS:
        print(f"depth {d}: best {best[d]:.1f} files/s", flush=True)


if __name__ == "__main__":
    main()
