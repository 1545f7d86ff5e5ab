"""Slow, exact per-pixel rasterizer backend (tests / tiny scenes).

Composites *every* surfel against every pixel in global center-depth order —
the same ordering approximation the tile-based CUDA rasterizer uses — so it
is the ground truth the production tiled/pallas backends are validated
against (SURVEY.md §4 test strategy item (b)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lara_tpu.utils.camera import Camera
from lara_tpu.ops.rasterizer.blend import composite, normalize_outputs, pixel_rays
from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels
from lara_tpu.ops.rasterizer.types import RasterizeConfig, RenderOutput


def rasterize_reference(
    means3d, shs, opacities, scales, rotations,
    camera: Camera, bg: jnp.ndarray, cfg: RasterizeConfig,
    pixel_chunk: int = 4096,
) -> RenderOutput:
    g = preprocess_surfels(means3d, shs, opacities, scales, rotations, camera, cfg)

    order = jnp.argsort(jnp.where(g.valid, g.depth, jnp.inf))
    g = jax.tree.map(lambda a: jnp.take(a, order, axis=0), g)
    n = means3d.shape[0]
    entry_valid = jnp.ones((n,), bool)

    H, W = cfg.height, cfg.width
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pix_xy = jnp.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], axis=-1)  # [P,2]

    num_px = H * W
    pad = (-num_px) % pixel_chunk
    pix_xy_p = jnp.pad(pix_xy, ((0, pad), (0, 0)))
    chunks = pix_xy_p.reshape(-1, pixel_chunk, 2)

    def per_chunk(xy):
        dirs = pixel_rays(cfg, camera.tanfovx, camera.tanfovy, xy)
        return composite(g, entry_valid, xy, dirs, bg, cfg)

    out = jax.lax.map(per_chunk, chunks)
    out = jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:])[:num_px], out)
    out = normalize_outputs(out, cfg)

    return RenderOutput(
        image=out["image"].reshape(H, W, 3),
        alpha=out["alpha"].reshape(H, W),
        depth_expected=out["depth_expected"].reshape(H, W),
        depth_median=out["depth_median"].reshape(H, W),
        normal=out["normal"].reshape(H, W, 3),
        distortion=out["distortion"].reshape(H, W),
    )
