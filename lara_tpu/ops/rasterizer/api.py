"""Public rasterizer entry point with backend dispatch."""

from __future__ import annotations

import jax.numpy as jnp

from lara_tpu.utils.camera import Camera
from lara_tpu.ops.rasterizer.types import RasterizeConfig, RenderOutput


def resolve_backend(backend: str) -> str:
    """Map the config's "auto" to a concrete backend: the Pallas kernels on
    TPU, the XLA tiled formulation elsewhere (CPU/GPU/interpret)."""
    if backend != "auto":
        return backend
    import jax
    return "pallas" if jax.default_backend() == "tpu" else "tiled"


def rasterize(
    means3d: jnp.ndarray,    # [N, 3] world-space surfel centers
    shs: jnp.ndarray,        # [N, (deg+1)^2, 3] SH coefficients
    opacities: jnp.ndarray,  # [N] activated opacities (sigmoid applied)
    scales: jnp.ndarray,     # [N, 2] activated tangent scales (exp applied)
    rotations: jnp.ndarray,  # [N, 4] quaternions (w,x,y,z)
    camera: Camera,
    bg: jnp.ndarray,         # [3] background color
    cfg: RasterizeConfig,
) -> RenderOutput:
    """Differentiable 2D Gaussian surfel rasterization.

    Replaces `GaussianRasterizer(...)(means3D, means2D, shs, opacities,
    scales, rotations)` of the CUDA extension (call site:
    lightning/renderer_2dgs.py:209-218). Gradients flow to means3d, shs,
    opacities, scales and rotations via JAX autodiff (tiled/reference) or a
    custom VJP (pallas).
    """
    if cfg.backend == "tiled":
        from lara_tpu.ops.rasterizer.tiled import rasterize_tiled
        return rasterize_tiled(means3d, shs, opacities, scales, rotations, camera, bg, cfg)
    if cfg.backend == "reference":
        from lara_tpu.ops.rasterizer.reference import rasterize_reference
        return rasterize_reference(means3d, shs, opacities, scales, rotations, camera, bg, cfg)
    if cfg.backend == "pallas":
        from lara_tpu.ops.rasterizer.pallas import rasterize_pallas
        return rasterize_pallas(means3d, shs, opacities, scales, rotations, camera, bg, cfg)
    raise ValueError(f"unknown rasterizer backend: {cfg.backend!r}")
