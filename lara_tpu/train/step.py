"""Jit-compiled train/eval steps with mesh data parallelism.

Counterpart of lightning/system.py:24-45 (training_step/validation_step) +
the DDP machinery: one jitted step takes a dp-sharded batch and replicated
state; XLA's SPMD partitioner propagates the *committed input shardings*
(`shard_batch` device_puts the batch with NamedSharding over dp; params are
replicated with `replicate_state`) and inserts the gradient all-reduce over
ICI automatically (SURVEY.md §5.8).

Deliberately NO in_shardings/out_shardings constraints on the jits: on the
axon TPU backend explicit sharding constraints force a per-step relayout
through the host tunnel — measured 139 s/step vs 1.1 s without, identical
computation. Input placement carries the same information.

`with_fine` is a compile-time flag: the driver switches to the fine-enabled
step function once global_step > train.start_fine
(lightning/system.py:26, configs/base.yaml:63). The loss-schedule gates that
depend on the *step value* (distortion/normal after 1000) are traced instead.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
from jax.sharding import Mesh

from lara_tpu.models import LaRaNet
from lara_tpu.train.loss import compute_losses


def make_train_step(net: LaRaNet, mesh: Mesh, with_fine: bool,
                    grad_accum: int = 1, n_views_sel=None) -> Callable:
    """`n_views_sel` (static int, use_rand_views): encode only the first
    n_views_sel input views — the reference's random-subset semantics
    (lightning/network.py:434-438) at the reference's cost, one compiled
    variant per count (persistent-cache-friendly)."""
    def step_fn(state, batch) -> Tuple:
        def loss_fn(params):
            out = net.apply(params, batch, with_fine=with_fine, train=True,
                            n_views_sel=n_views_sel)
            # state.step counts micro-steps (one per apply_gradients under
            # optax.MultiSteps); the reference's loss gates count *optimizer*
            # steps (Lightning global_step, lightning/loss.py:49).
            loss, stats = compute_losses(batch, out, state.step // grad_accum)
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        stats = dict(stats)
        stats["loss"] = loss
        return new_state, stats

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(net: LaRaNet, mesh: Mesh, with_fine: bool = True) -> Callable:
    def step_fn(params, batch, step):
        out = net.apply(params, batch, with_fine=with_fine, train=False)
        loss, stats = compute_losses(batch, out, step)
        stats = dict(stats)
        stats["loss"] = loss
        return out, stats

    return jax.jit(step_fn)


def make_forward(net: LaRaNet, with_fine: bool = True,
                 return_buffer: bool = False,
                 render_scale: float = 1.0) -> Callable:
    """Plain jitted inference forward (evaluation.py:61 equivalent);
    `render_scale` maps to the reference's `render_img_scale`
    (lightning/network.py:467)."""

    @functools.partial(jax.jit)
    def fwd(params, batch):
        return net.apply(params, batch, with_fine=with_fine, train=False,
                         return_buffer=return_buffer, render_scale=render_scale)

    return fwd
