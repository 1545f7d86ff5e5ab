"""Bilinear grid sampling matching torch.nn.functional.grid_sample.

The reference uses grid_sample twice on the hot path:
  - sampling DINO feature maps at projected voxel centers
    (lightning/network.py:374, align_corners=False, zeros padding),
  - sampling coarse renders + reference images at projected surfel centers
    for the fine stage (lightning/network.py:405).

Implemented as explicit gathers so XLA fuses it; exactly reproduces torch's
align_corners=False coordinate mapping ix = ((gx + 1) * W - 1) / 2 and
zero-padding border behavior.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(feats: jnp.ndarray, grid: jnp.ndarray,
                   align_corners: bool = False) -> jnp.ndarray:
    """Sample feats [C, H, W] at normalized coords grid [..., 2] (x, y in
    [-1, 1]); returns [..., C]. Out-of-range samples use zero padding."""
    C, H, W = feats.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (W - 1)
        iy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        ix = ((gx + 1.0) * W - 1.0) * 0.5
        iy = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1, y1 = x0 + 1.0, y0 + 1.0
    wx1 = ix - x0
    wy1 = iy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def fetch(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = feats[:, yc, xc]                    # [C, ...]
        vals = jnp.moveaxis(vals, 0, -1)           # [..., C]
        return jnp.where(inb[..., None], vals, 0.0)

    out = (
        fetch(x0, y0) * (wx0 * wy0)[..., None]
        + fetch(x1, y0) * (wx1 * wy0)[..., None]
        + fetch(x0, y1) * (wx0 * wy1)[..., None]
        + fetch(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out
