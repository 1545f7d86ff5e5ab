"""Optimizer / schedule / train-state construction.

Counterpart of lightning/system.py:78-118 (`configure_optimizers`) and
lightning/utils.py:89-107 (`CosineWarmupScheduler`):

  - AdamW(lr, betas=(0.9, 0.95), weight_decay=0.05) with weight decay masked
    OFF for every bias and LayerNorm parameter (system.py:79-100);
  - linear warmup from ~0 over `warmup_iters`, then cosine to 0 at
    `max_iters`, stepped per optimizer step;
  - global-norm gradient clipping 0.5 (train_lightning.py:74);
  - gradient accumulation ×2 via optax.MultiSteps (train_lightning.py:73).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax
from flax import traverse_util
from flax.training import train_state

from lara_tpu.config import TrainConfig


class TrainState(train_state.TrainState):
    pass


def decay_mask(params) -> Any:
    """True (decay) for every parameter that is neither a bias nor a
    LayerNorm scale/bias. Flax LayerNorm params are named scale/bias; Dense/
    Conv biases are named bias — so masking on leaf name reproduces the
    reference's module-walk exactly."""
    flat = traverse_util.flatten_dict(params)
    mask = {k: (k[-1] not in ("bias", "scale")) for k in flat}
    return traverse_util.unflatten_dict(mask)


def cosine_warmup_schedule(base_lr: float, warmup_iters: int, max_iters: int,
                           initial_lr: float = 1e-10) -> optax.Schedule:
    """Linear warmup then cosine decay to 0 (lightning/utils.py:96-107)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = initial_lr + (base_lr - initial_lr) * step / max(warmup_iters, 1)
        t = jnp.clip((step - warmup_iters) / max(max_iters - warmup_iters, 1), 0.0, 1.0)
        cos = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(step <= warmup_iters, warm, cos)

    return schedule


def make_optimizer(cfg: TrainConfig, max_iters: int):
    sched = cosine_warmup_schedule(cfg.lr, cfg.warmup_iters, max_iters)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=sched,
            b1=cfg.beta1, b2=cfg.beta2,
            weight_decay=cfg.weight_decay,
            mask=decay_mask,
        ),
    )
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx, sched


def create_train_state(params, cfg: TrainConfig, max_iters: int,
                       apply_fn=None) -> TrainState:
    tx, _ = make_optimizer(cfg, max_iters)
    return TrainState.create(apply_fn=apply_fn, params=params, tx=tx)
