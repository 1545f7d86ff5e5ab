"""Orbax checkpointing (counterpart of Lightning ModelCheckpoint + resume;
train_lightning.py:58-64,85-90, SURVEY.md §5.4).

Saves (params, opt_state, step, epoch) every `ckpt_every_n_epoch` epochs;
`restore` rebuilds the full trainer state (model + optimizer + counters),
`restore_params` is the eval-side weight-only load (evaluation.py:45)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _mgr(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=5, create=True),
    )


def save_checkpoint(directory: str, step: int, state: Any, epoch: int) -> None:
    mgr = _mgr(directory)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": int(state.step),
        "epoch": int(epoch),
    }
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _mgr(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, template: Any, step: Optional[int] = None):
    """Restore {params, opt_state, step, epoch} matching `template`'s
    structure/sharding (template = same dict built from a fresh state)."""
    mgr = _mgr(directory)
    step = step if step is not None else mgr.latest_step()
    out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return out


def restore_params(directory: str, step: Optional[int] = None):
    """Weight-only restore for evaluation (structure read from the
    checkpoint itself; arrays land on the default device).

    Checkpoints written on one backend must restore on another (train on
    TPU → evaluate on CPU): a bare restore replays the *saved* sharding
    metadata and fails with "Device TPU v5 lite0 was not found", so on
    that failure the tree is rebuilt from the checkpoint's own metadata
    with every array re-targeted at the local default device."""
    mgr = _mgr(directory)
    step = step if step is not None else mgr.latest_step()
    try:
        out = mgr.restore(step)
    except ValueError:
        meta = mgr.item_metadata(step)
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

        def absify(m):
            shape = getattr(m, "shape", None)
            dtype = getattr(m, "dtype", None)
            if shape is None or dtype is None:
                return m
            return jax.ShapeDtypeStruct(tuple(shape), dtype, sharding=sharding)

        abstract = jax.tree.map(absify, meta,
                                is_leaf=lambda x: hasattr(x, "shape"))
        out = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    params = out["params"]
    return jax.tree.map(jax.numpy.asarray, params)
