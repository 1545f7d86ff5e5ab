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


def views_remat_policy(save: str):
    """Policy for the per-view render remat (ModelConfig.remat_views_save).

    `save` is a comma list of compact rasterizer residual families to keep
    across the checkpoint boundary instead of recomputing in the backward
    (tagged with jax.ad_checkpoint.checkpoint_name at their definition):

      "bin"     — integer binning state (depth order, tile windows): skips
                  re-running the 9V-key sort (~2.7 ms/view) and the depth
                  argsort in the backward;
      "packed"  — the compacted [V, 13] surfel rows: skips the pack row
                  gather (~1.4 ms/view);
      "entries" — the windowed [T, K, 13] blend input: skips the window
                  row gather;
      "stash"   — the blend kernel's chunk carries + processed-chunk
                  counts: skips re-running the forward blend kernel
                  (~3.4 ms/view) before its replay-free backward.

    Everything else (preprocess math, activations) is still recomputed, so
    the HBM cost stays bounded: per 512² view the four families total
    ~18 MB in lane-friendly layouts, vs the 250+ MB/view of padded f32
    preprocess residuals that motivated remat_views in the first place.
    Empty string = plain jax.checkpoint (save nothing)."""
    names = ["raster_" + s.strip() for s in save.split(",") if s.strip()]
    if not names:
        return None
    return jax.checkpoint_policies.save_only_these_names(*names)
