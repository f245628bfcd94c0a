#!/bin/bash
# One-shot on-hardware validation battery. Run (in the background, with a
# generous outer timeout) whenever the relay comes back after kernel or
# encoder changes:
#
#   bash scripts/chip_validate.sh 2>&1 | tee /tmp/chip_validate.log
#
# Order: correctness sweeps first (fail fast), then the bench suites the
# driver records. Each step gets its own timeout so one relay stall cannot
# eat the battery; a step failure is printed but later steps still run
# (bench numbers are useful even if an earlier suite flaked).
set -u
cd "$(dirname "$0")/.."
overall=0

step() {
  local name="$1" tmo="$2"; shift 2
  echo "=== ${name} (timeout ${tmo}s) ==="
  local t0=$SECONDS
  if timeout "${tmo}" "$@"; then
    echo "=== ${name}: OK ($((SECONDS - t0))s) ==="
  else
    echo "=== ${name}: FAILED rc=$? ($((SECONDS - t0))s) ==="
    overall=1
  fi
}

# Slow relay states push the full sweep past an hour (round-10 measured
# ~2x 3300 s) — give it headroom; 0 failures is the only acceptable result.
step chip_exactness   7200 python scripts/chip_exactness.py
step encoder_parity    900 python scripts/chip_encoder_parity.py
for suite in search_1m search_1m_f32 search_10m_mat256 encode finetune pipeline_nomic; do
  step "bench_${suite}" 1800 env BENCH_SUITE="${suite}" python bench.py
done

echo "=== battery done, overall=$([ $overall -eq 0 ] && echo OK || echo FAILED) ==="
exit $overall
