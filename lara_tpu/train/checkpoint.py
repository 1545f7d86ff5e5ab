"""Orbax checkpointing (counterpart of Lightning ModelCheckpoint + resume;
train_lightning.py:58-64,85-90, SURVEY.md §5.4).

Saves (params, opt_state, step, epoch) every `ckpt_every_n_epoch` epochs;
`restore` rebuilds the full trainer state (model + optimizer + counters),
`restore_params` is the eval-side weight-only load (evaluation.py:45)."""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
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


def migrate_unrolled_layout(tree):
    """Upgrade a pre-scan checkpoint tree to the scanned-stack layout.

    The ViT/volume layer stacks moved from unrolled per-layer modules
    (`img_encoder.block{i}`, `vol_decoder.layer{i}`) to one nn.scan body
    with a leading layer axis (`blocks.block`, `layers.block`). This walks
    any pytree (params or the optimizer-state trees mirroring them) and
    stacks complete `block0..N` / `layer0..N` runs into the scan layout.
    Containers other than dicts (optax namedtuples, tuples/lists) pass
    through structurally unchanged."""
    def rec(node):
        if isinstance(node, dict):
            node = {k: rec(v) for k, v in node.items()}
            for prefix, scan_name in (("block", "blocks"),
                                      ("layer", "layers")):
                idx = {}
                for k in node:
                    m = re.fullmatch(prefix + r"(\d+)", k)
                    if m:
                        idx[int(m.group(1))] = k
                if idx and set(idx) == set(range(len(idx))) \
                        and scan_name not in node:
                    parts = [node.pop(idx[i]) for i in range(len(idx))]
                    node[scan_name] = {"block": jax.tree.map(
                        lambda *xs: jnp.stack(xs), *parts)}
            return node
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(rec(c) for c in node))
        if isinstance(node, (tuple, list)):
            return type(node)(rec(c) for c in node)
        return node

    return rec(tree)


def _restore_raw(mgr, step):
    """Restore with the checkpoint's own structure, re-targeting arrays at
    the local default device when the saved sharding metadata names devices
    this process doesn't have (train on TPU → restore on CPU)."""
    try:
        return mgr.restore(step)
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
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def restore_checkpoint(directory: str, template: Any, step: Optional[int] = None):
    """Restore {params, opt_state, step, epoch} matching `template`'s
    structure/sharding (template = same dict built from a fresh state).

    Checkpoints written before the scanned-stack refactor restore through
    `migrate_unrolled_layout`; any other structure mismatch raises with the
    orbax detail attached."""
    mgr = _mgr(directory)
    step = step if step is not None else mgr.latest_step()
    try:
        out = mgr.restore(step, args=ocp.args.StandardRestore(template))
        mgr.close()
        return out
    except ValueError as e:
        raw = _restore_raw(mgr, step)
        mgr.close()
        migrated = migrate_unrolled_layout(raw)
        try:
            return _conform(template, migrated)
        except Exception as e2:
            raise ValueError(
                f"checkpoint in {directory} does not match the current "
                "trainer state even after the unrolled->scanned layout "
                f"migration ({e2}) — resume from a compatible checkpoint or "
                f"start fresh (original orbax error: {str(e)[:500]})") from e


def _conform(tmpl, raw):
    """Rebuild `raw` (a raw orbax restore: namedtuples as field-name dicts,
    tuples as lists) into `tmpl`'s container types, leaf by leaf. Arrays are
    left uncommitted (jit places them; committed inputs are pathological on
    the axon backend — parallel/mesh.py)."""
    if raw is None:
        # leafless subtrees (optax EmptyState, None) restore as None
        if jax.tree.leaves(tmpl):
            raise ValueError("checkpoint is missing a non-empty subtree")
        return tmpl
    if isinstance(tmpl, dict):
        if not isinstance(raw, dict) or set(raw) != set(tmpl):
            raise ValueError(
                f"dict keys differ: {sorted(tmpl)} vs "
                f"{sorted(raw) if isinstance(raw, dict) else type(raw)}")
        return {k: _conform(v, raw[k]) for k, v in tmpl.items()}
    if isinstance(tmpl, tuple) and hasattr(tmpl, "_fields"):
        children = ([raw[f] for f in tmpl._fields] if isinstance(raw, dict)
                    else list(raw))
        if len(children) != len(tmpl):
            raise ValueError(f"{type(tmpl).__name__} arity mismatch")
        return type(tmpl)(*(_conform(t, r) for t, r in zip(tmpl, children)))
    if isinstance(tmpl, (tuple, list)):
        if len(raw) != len(tmpl):
            raise ValueError("sequence length mismatch")
        return type(tmpl)(_conform(t, r) for t, r in zip(tmpl, raw))
    if hasattr(tmpl, "shape"):
        x = jnp.asarray(raw, getattr(tmpl, "dtype", None))
        if tuple(x.shape) != tuple(tmpl.shape):
            raise ValueError(f"leaf shape {x.shape} != {tuple(tmpl.shape)}")
        return x
    return type(tmpl)(raw) if raw is not None else tmpl


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
    out = _restore_raw(mgr, step)
    mgr.close()
    params = migrate_unrolled_layout(out["params"])
    return jax.tree.map(jax.numpy.asarray, params)
