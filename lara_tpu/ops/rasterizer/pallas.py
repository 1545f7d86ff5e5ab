"""Pallas rasterizer backend: XLA preprocess/binning + Pallas blend kernels.

Fully differentiable: the blend has a custom VJP (Pallas backward kernel
with per-tile early exit); the surrounding preprocess → pack → sort-gather →
window-gather chain is plain JAX, so gradients reach means/shs/opacities/
scales/rotations through standard gather transposes.

`rasterize_pallas(..., return_binned=True)` additionally returns the
per-view `BinnedView` (integer binning state), and `blend_binned_pallas`
re-composites it with new colors — the fine-stage re-render (identical
geometry, new SH) skips the depth sort + tile-window construction that way
(the CUDA reference re-runs its whole pipeline,
lightning/network.py:502-525).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lara_tpu.utils.camera import Camera
from lara_tpu.ops.rasterizer.pallas_blend import blend_tiles_pallas
from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels
from lara_tpu.ops.rasterizer.tiled import BinnedView, bin_view, window_gather
from lara_tpu.ops.rasterizer.types import RasterizeConfig, RenderOutput


def rasterize_pallas(
    means3d, shs, opacities, scales, rotations,
    camera: Camera, bg: jnp.ndarray, cfg: RasterizeConfig,
    return_binned: bool = False,
):
    assert cfg.tile_budget % cfg.pallas_chunk == 0, (
        "tile_budget must be a multiple of pallas_chunk")
    g = preprocess_surfels(means3d, shs, opacities, scales, rotations, camera, cfg)
    packed, binned = bin_view(g, cfg)
    out = blend_binned_pallas(packed, binned, camera, bg, cfg)
    return (out, binned) if return_binned else out


def blend_binned_pallas(
    packed: jnp.ndarray, binned: BinnedView,
    camera: Camera, bg: jnp.ndarray, cfg: RasterizeConfig,
) -> RenderOutput:
    """Composite from an existing binning (packed from `bin_view` for the
    first render, or `repack_from_binned` for a re-render)."""
    entries = window_gather(packed, binned.win_gidx, binned.entry_valid,
                            cfg.dup * cfg.dup,
                            slot_pos=binned.slot_pos)  # [T, K, 13]
    # saveable across the per-view remat (models/remat.py:views_remat_policy)
    entries = jax.ad_checkpoint.checkpoint_name(entries, "raster_entries")

    scalars = jnp.stack([
        jnp.asarray(camera.tanfovx, jnp.float32).reshape(()),
        jnp.asarray(camera.tanfovy, jnp.float32).reshape(()),
    ])
    out = blend_tiles_pallas(entries, binned.counts, scalars, cfg)  # [T, C, P]

    tile = cfg.tile

    def to_image(a):  # [T, P] or [T, P, ch] -> [H, W, ...]
        ch = a.shape[2:]
        a = a.reshape(cfg.tiles_y, cfg.tiles_x, tile, tile, *ch)
        a = jnp.swapaxes(a, 1, 2)
        return a.reshape(cfg.height, cfg.width, *ch)

    chans = out.transpose(0, 2, 1)                # [T, P, C]
    alpha = to_image(chans[..., 3])
    image = to_image(chans[..., 0:3]) + (1.0 - alpha)[..., None] * bg.astype(jnp.float32)
    dsum = to_image(chans[..., 4])
    depth_expected = jnp.where(alpha > 1e-6, dsum / jnp.maximum(alpha, 1e-6), 0.0)
    return RenderOutput(
        image=image,
        alpha=alpha,
        depth_expected=depth_expected,
        depth_median=to_image(chans[..., 5]),
        normal=to_image(chans[..., 6:9]),
        distortion=to_image(chans[..., 9]),
    )
