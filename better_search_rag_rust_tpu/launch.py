"""Multi-host launch helpers — the TPU-native replacement for the
reference's launch infra (reference: makefile:13-14 ``mpiexec -n $(N)``,
run-slurm.sh, hostfile ``localhost slots=32``).

On TPU pods there is no mpiexec: every host runs the same program and joins
the cluster via ``jax.distributed.initialize``. GKE/GCE TPU environments
inject the coordinator automatically; elsewhere, set:

    BSR_COORDINATOR=host0:8476  BSR_NUM_PROCESSES=4  BSR_PROCESS_ID=0..3

`scripts/launch_pod.sh` fans the same command out to every pod worker.
"""

from __future__ import annotations

import os
from typing import Optional

from .utils.logging import host_log


def maybe_init_distributed() -> bool:
    """Join the multi-host cluster when the env asks for it; no-op (False)
    for single-host runs. Safe to call more than once.

    Must run BEFORE anything touches the XLA backend, so the
    already-initialized check inspects the distributed client directly
    instead of calling ``jax.process_count()`` (which would initialize it).
    """
    import jax

    try:
        initialized = jax.distributed.is_initialized()
    except AttributeError:  # older jax: fall back to the private state
        try:
            from jax._src import distributed as _dist

            initialized = getattr(_dist.global_state, "client", None) is not None
        except Exception:
            initialized = False
    if initialized:
        return True  # explicitly initialized earlier
    coord = os.environ.get("BSR_COORDINATOR")
    nproc = os.environ.get("BSR_NUM_PROCESSES")
    if not coord or not nproc:
        # No env contract: rely on platform auto-injection (GKE/GCE pods).
        return jax.process_count() > 1
    pid = int(os.environ.get("BSR_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc),
        process_id=pid,
    )
    host_log(
        f"joined cluster {coord} as process {pid}/{nproc} "
        f"({len(jax.local_devices())} local devices)"
    )
    return True
