"""Multi-host initialization (counterpart of Lightning's DDP process-group
bring-up, train_lightning.py:68-72, re-expressed the JAX way).

On a TPU pod slice each host sees only its local chips until
`jax.distributed.initialize()` stitches the processes into one global
runtime; afterwards `jax.devices()` is global and the same single-program
train step (mesh + sharded batch) scales across hosts with the gradient
all-reduce riding ICI. On GKE/Cloud-TPU the coordinator/process env is
auto-detected; elsewhere set JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID /
JAX_NUM_PROCESSES (or pass explicitly).
"""

from __future__ import annotations

import os


def maybe_initialize_distributed(coordinator: str | None = None,
                                 num_processes: int | None = None,
                                 process_id: int | None = None) -> bool:
    """Initialize jax.distributed when a multi-process env is detected.

    Returns True if the distributed runtime was (already) initialized.
    Safe to call unconditionally: single-process runs are a no-op, and a
    second call after successful init is ignored."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_str = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(num_str) if num_str else None)
    pid_str = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(pid_str) if pid_str else None)

    # Only bring up the distributed runtime on an EXPLICIT multi-process
    # setup: a coordinator address, or a worker-count > 1. Merely TPU-ish
    # env vars (TPU_WORKER_HOSTNAMES etc.) are not enough — single-host
    # containers (e.g. the axon tunnel's sitecustomize) set those too, and
    # initialize() hard-fails once any backend is live.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    n_hosts = len([h for h in hostnames.split(",") if h.strip()])
    multi = ((num_processes or 0) > 1 or n_hosts > 1
             or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator is None and not multi:
        return False  # single-host run

    from jax._src import xla_bridge
    if xla_bridge.backends_are_initialized():
        # too late to initialize (and on a single host there is no need);
        # a real pod would have called this before any device use
        return False

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
        return True
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return True
        raise
