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

    try:
        # initialize() itself guards against live backends (public API, no
        # jax._src probing): it raises RuntimeError when called too late.
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
        return True
    except RuntimeError as e:
        msg = str(e).lower()
        if "already initialized" in msg:
            return True
        if "before" in msg or "backend" in msg:
            # Too late: a JAX backend is live. On a real pod this silently
            # falling back to single-process training would mean a wrong
            # global batch — shout about it instead of hiding it.
            import warnings
            warnings.warn(
                "multi-process JAX was requested "
                f"(coordinator={coordinator!r}, num_processes={num_processes!r}) "
                "but a JAX backend is already initialized — falling back to "
                "SINGLE-process training. Call maybe_initialize_distributed() "
                "before any jax device use.",
                RuntimeWarning, stacklevel=2)
            return False
        raise
