"""Jit-compiled train/eval steps with mesh data parallelism.

Counterpart of lightning/system.py:24-45 (training_step/validation_step) +
the DDP machinery: one jitted step takes a dp-sharded batch and replicated
state; XLA inserts the gradient all-reduce over ICI automatically from the
output sharding constraints (SURVEY.md §5.8).

`with_fine` is a compile-time flag: the driver switches to the fine-enabled
step function once global_step > train.start_fine
(lightning/system.py:26, configs/base.yaml:63). The loss-schedule gates that
depend on the *step value* (distortion/normal after 1000) are traced instead.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lara_tpu.models import LaRaNet
from lara_tpu.train.loss import compute_losses


def _batch_arrays(batch: Dict) -> Dict:
    return {k: v for k, v in batch.items() if k != "meta"}


def make_train_step(net: LaRaNet, mesh: Mesh, with_fine: bool) -> Callable:
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))

    def step_fn(state, batch) -> Tuple:
        def loss_fn(params):
            out = net.apply(params, batch, with_fine=with_fine, train=True)
            loss, stats = compute_losses(batch, out, state.step)
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        stats = dict(stats)
        stats["loss"] = loss
        return new_state, stats

    return jax.jit(
        step_fn,
        in_shardings=(repl, dp),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step(net: LaRaNet, mesh: Mesh, with_fine: bool = True) -> Callable:
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))

    def step_fn(params, batch, step):
        out = net.apply(params, batch, with_fine=with_fine, train=False)
        loss, stats = compute_losses(batch, out, step)
        stats = dict(stats)
        stats["loss"] = loss
        return out, stats

    return jax.jit(step_fn, in_shardings=(repl, dp, None),
                   static_argnums=())


def make_forward(net: LaRaNet, with_fine: bool = True,
                 return_buffer: bool = False) -> Callable:
    """Plain jitted inference forward (evaluation.py:61 equivalent)."""

    @functools.partial(jax.jit, static_argnums=())
    def fwd(params, batch):
        return net.apply(params, batch, with_fine=with_fine, train=False,
                         return_buffer=return_buffer)

    return fwd
