"""Pallas rasterizer backend: XLA preprocess/binning + Pallas blend kernel.

Forward-only for now (used for evaluation/video rendering); training uses
the autodiff `tiled` backend until the Pallas backward kernel lands.
"""

from __future__ import annotations

import jax.numpy as jnp

from lara_tpu.utils.camera import Camera
from lara_tpu.ops.rasterizer.pallas_blend import CHUNK, blend_tiles_pallas
from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels
from lara_tpu.ops.rasterizer.tiled import bin_surfels
from lara_tpu.ops.rasterizer.types import RasterizeConfig, RenderOutput


def rasterize_pallas(
    means3d, shs, opacities, scales, rotations,
    camera: Camera, bg: jnp.ndarray, cfg: RasterizeConfig,
) -> RenderOutput:
    assert cfg.tile_budget % CHUNK == 0, "tile_budget must be a multiple of 32"
    g = preprocess_surfels(means3d, shs, opacities, scales, rotations, camera, cfg)
    packed, win_gidx, _, counts = bin_surfels(g, cfg)
    entries = packed[win_gidx]                    # [T, K, 20]

    out = blend_tiles_pallas(entries, counts, camera.tanfovx, camera.tanfovy,
                             bg.astype(jnp.float32), cfg)   # [T, C, P]

    tile = cfg.tile

    def to_image(a):  # [T, P] or [T, P, ch] -> [H, W, ...]
        ch = a.shape[2:]
        a = a.reshape(cfg.tiles_y, cfg.tiles_x, tile, tile, *ch)
        a = jnp.swapaxes(a, 1, 2)
        return a.reshape(cfg.height, cfg.width, *ch)

    chans = out.transpose(0, 2, 1)                # [T, P, C]
    return RenderOutput(
        image=to_image(chans[..., 0:3]),
        alpha=to_image(chans[..., 3]),
        depth_expected=to_image(chans[..., 4]),
        depth_median=to_image(chans[..., 5]),
        normal=to_image(chans[..., 6:9]),
        distortion=to_image(chans[..., 9]),
    )
