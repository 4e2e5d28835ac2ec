"""Multi-host initialization (the reference's init_distributed_mode,
tools.py:299-322, re-imagined for JAX).

The reference bootstraps NCCL from RANK/WORLD_SIZE/LOCAL_RANK env vars
or SLURM.  On TPU pods, jax.distributed discovers the topology from the
TPU environment itself; on CPU/GPU clusters the same env-var contract is
honored.  After initialization every process sees the global device set
and GSPMD handles all communication — there is no backend object to
thread through the code.
"""

from __future__ import annotations

import os

import jax


def init_multihost() -> dict:
    """Initialize jax.distributed when a multi-process environment is
    detected; no-op (single process) otherwise.

    Returns a summary dict {process_index, process_count, local_devices,
    global_devices}.
    """
    coordinator = os.environ.get("COORDINATOR_ADDRESS")
    num_procs = os.environ.get("WORLD_SIZE") or os.environ.get("NUM_PROCESSES")
    proc_id = os.environ.get("RANK") or os.environ.get("PROCESS_ID")

    try:
        if coordinator and num_procs and proc_id is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=int(num_procs),
                process_id=int(proc_id),
            )
        elif os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"
        ):
            # TPU pod: topology is discoverable without explicit args
            jax.distributed.initialize()
    except Exception as e:  # already initialized, or single-host TPU VM
        if "already" not in str(e).lower():
            print(f"multihost init skipped: {e}")

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
