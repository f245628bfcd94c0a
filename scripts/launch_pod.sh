#!/usr/bin/env bash
# Multi-host TPU pod launcher — the TPU-native replacement for the
# reference's SLURM script (reference: run-slurm.sh) and hostfile.
#
# On a Cloud TPU pod slice, run the same command on every worker; JAX picks
# the coordinator up from the TPU metadata automatically:
#
#   ./scripts/launch_pod.sh TPU_NAME ZONE "python -m better_search_rag_rust_tpu run --root ..."
#
# On a hand-rolled host list (no TPU metadata), export the cluster env that
# better_search_rag_rust_tpu.launch.maybe_init_distributed consumes:
#
#   BSR_COORDINATOR=host0:8476 BSR_NUM_PROCESSES=4 BSR_PROCESS_ID=<i> <cmd>
set -euo pipefail

TPU_NAME="${1:?usage: launch_pod.sh TPU_NAME ZONE CMD...}"
ZONE="${2:?usage: launch_pod.sh TPU_NAME ZONE CMD...}"
shift 2
CMD="$*"

exec gcloud compute tpus tpu-vm ssh "${TPU_NAME}" \
  --zone "${ZONE}" \
  --worker=all \
  --command "cd $(pwd) && ${CMD}"
