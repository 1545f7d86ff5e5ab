"""Differentiable tile-based 2D Gaussian surfel (2DGS) rasterizer for TPU.

TPU-native replacement for the reference's CUDA extension
``diff_surfel_rasterization`` (interface reconstructed in SURVEY.md §2.3 from
the call sites in lightning/renderer_2dgs.py:119-139,209-218).

Pipeline (all static shapes, jit/vmap-safe):
  1. preprocess  — per-surfel camera transform, ray-space axes, SH→RGB,
                   screen bounds, frustum cull (vectorized JAX).
  2. binning     — fixed-fanout (tile, surfel) duplication; depth sort +
                   stable tile sort (XLA sort); per-tile ranges.
  3. blending    — per-tile front-to-back alpha compositing of the K nearest
                   entries via exclusive log-transmittance cumsum; emits
                   image / alpha / expected & median depth / normal /
                   distortion maps.
Backends:
  - ``reference``: O(N·P) per-pixel renderer for tests and tiny scenes.
  - ``tiled``: production pure-JAX tile renderer (autodiff backward).
  - ``pallas``: hand-written TPU kernel with per-tile early termination.
"""

from lara_tpu.ops.rasterizer.types import RasterizeConfig, RenderOutput
from lara_tpu.ops.rasterizer.api import (rasterize, rasterize_and_bin,
                                         rasterize_rebind)

__all__ = ["RasterizeConfig", "RenderOutput", "rasterize",
           "rasterize_and_bin", "rasterize_rebind"]
