"""Rematerialization policies for the scanned transformer stacks.

The reference relies on torch's default autograd (keep everything); on TPU
the flagship step is HBM-bound, so the layer stacks are remat'd. The
policy picks the FLOPs/memory trade inside each layer's remat boundary:

  "full": save nothing — recompute the whole layer in the backward
          (minimum HBM, the round-3 OOM fix default);
  "dots": save MXU outputs without batch dims (jax.checkpoint_policies.
          dots_with_no_batch_dims_saveable) — skips recomputing the
          matmuls, recomputes only cheap elementwise/layout ops, at the
          cost of keeping per-layer activations resident.
"""

from __future__ import annotations

import jax


def remat_policy(name: str):
    """Map a config string to a jax.checkpoint policy (None = save
    nothing)."""
    if name in (None, "full"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat_policy {name!r} (expected full|dots)")
