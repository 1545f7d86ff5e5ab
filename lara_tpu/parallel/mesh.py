"""Device mesh + sharding helpers.

Replaces the reference's process-group machinery (Lightning DDPStrategy over
NCCL, train_lightning.py:68-72; SURVEY.md §2.5/§5.8) with the JAX-native
equivalent: a named `Mesh` with a data axis, batch arrays sharded over `dp`,
parameters replicated, gradient all-reduce implicit in jit's partitioning.
A `tp` axis is reserved for future model sharding of the volume transformer
(the group axis is embarrassingly shardable — SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: Optional[int] = None, n_tp: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = devices.size // n_tp
    devices = devices[: n_dp * n_tp].reshape(n_dp, n_tp)
    return Mesh(devices, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the leading axis split over dp.
    Non-array entries (e.g. `meta`) are passed through.

    On a single-device mesh the batch is passed through UNCOMMITTED (no
    device_put at all): the axon TPU backend executes computations whose
    inputs carry *committed* placements — NamedSharding or even plain
    single-device — through a pathologically slow path (measured 59 s vs
    1.1 s for an otherwise identical train step). jit moves uncommitted
    arrays to the device itself."""
    if mesh.devices.size == 1:
        return dict(batch)
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sh)

    return {k: (v if k == "meta" else jax.tree.map(put, v)) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    """Replicate a train state's arrays across the mesh (explicit placement
    instead of jit sharding constraints — see lara_tpu/train/step.py)."""
    if mesh.devices.size <= 1:
        return state
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh) if hasattr(x, "shape") else x,
                        state)


def device_prefetch(iterator, mesh: Mesh, size: int = 2):
    """Wrap a host batch iterator with async device transfer `size` batches
    ahead (device_put is async — enqueueing ahead overlaps H2D with compute;
    replaces torch DataLoader's pin_memory+prefetch role)."""
    import collections

    queue = collections.deque()

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(iterator)
            except StopIteration:
                return
            sharded = shard_batch(batch, mesh)
            queue.append((sharded, batch.get("meta")))

    enqueue(size)
    while queue:
        sharded, meta = queue.popleft()
        enqueue(1)
        yield sharded, meta
