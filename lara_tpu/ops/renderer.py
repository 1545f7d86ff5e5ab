"""High-level surfel renderer: activations + auxiliary-map post-processing.

Functional counterpart of the reference `Renderer` wrapper
(lightning/renderer_2dgs.py:91-268): applies the parameter activations
(exp / sigmoid / L2-normalize, lines 106-114), invokes the rasterizer, and
derives the regularization maps (world-space rendered normal, mixed surface
depth, finite-difference depth normal, lines 226-254).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from lara_tpu.utils.camera import Camera, depth_to_normal
from lara_tpu.utils.quat import normalize as l2_normalize
from lara_tpu.ops.rasterizer import (RasterizeConfig, rasterize,
                                     rasterize_and_bin, rasterize_rebind)


def opacity_activation(x):
    # jax.nn.sigmoid has a numerically stable VJP (a naive 1/(1+exp(-x))
    # yields inf/inf = NaN gradients at the -1e4 padding the fine stage uses)
    import jax
    return jax.nn.sigmoid(x.astype(jnp.float32))


def scaling_activation(x):
    return jnp.exp(x.astype(jnp.float32))


def rotation_activation(x):
    return l2_normalize(x.astype(jnp.float32))


def render_view(
    camera: Camera,
    rays: Optional[jnp.ndarray],   # [H, W, 6] world rays for depth->normal; None to skip
    centers: jnp.ndarray,          # [N, 3]
    shs: jnp.ndarray,              # [N, SH, 3]
    opacity_raw: jnp.ndarray,      # [N] or [N,1] pre-sigmoid
    scaling_raw: jnp.ndarray,      # [N, 2] pre-exp
    rotation_raw: jnp.ndarray,     # [N, 4] unnormalized quaternion
    bg_color: jnp.ndarray,         # [3]
    cfg: RasterizeConfig,
    depth_ratio: float = 0.0,
    return_binned: bool = False,
):
    """Render one view; returns the reference frame dict
    (lightning/renderer_2dgs.py:258-268): image / depth / acc_map /
    rend_normal / depth_normal / rend_dist, all [H, W, ...] with HWC layout.
    With return_binned, also returns the per-view binning state for
    geometry-preserving re-renders (render_view_rebind).

    Inputs are cast to f32 before entering the rasterizer, matching the
    bf16-autocast boundary of the reference (lightning/network.py:260,283).
    """
    opacity = opacity_activation(opacity_raw.reshape(-1))
    scales = scaling_activation(scaling_raw)
    rotations = rotation_activation(rotation_raw)

    binned = None
    if return_binned:
        out, binned = rasterize_and_bin(
            centers.astype(jnp.float32), shs.astype(jnp.float32),
            opacity, scales, rotations, camera,
            bg_color.astype(jnp.float32), cfg)
    else:
        out = rasterize(
            centers.astype(jnp.float32), shs.astype(jnp.float32),
            opacity, scales, rotations, camera,
            bg_color.astype(jnp.float32), cfg)

    image = jnp.clip(out.image, 0.0, 1.0)

    frame = _postprocess(out, image, camera, rays, depth_ratio)
    return (frame, binned) if return_binned else frame


def _postprocess(out, image, camera: Camera, rays, depth_ratio: float):
    """Auxiliary-map derivation shared by first renders and re-renders
    (lightning/renderer_2dgs.py:226-254)."""
    # Rotate the accumulated normal from camera to world space
    # (lightning/renderer_2dgs.py:230: row-vectors @ w2c[:3,:3] ≡ R_c2w · n).
    rend_normal = out.normal @ camera.w2c[:3, :3]

    # Surface depth: expected/median mix (line 246).
    surf_depth = out.depth_expected * (1.0 - depth_ratio) + depth_ratio * out.depth_median

    frame = {
        "image": image,
        "depth": surf_depth[..., None],
        "acc_map": out.alpha,
        "rend_normal": rend_normal,
        "rend_dist": out.distortion,
    }
    if rays is not None:
        # Pseudo surface normal from finite differences of unprojected depth,
        # alpha-masked. The alpha factor is detached exactly like the
        # reference's `surf_normal * render_alpha.detach()`
        # (renderer_2dgs.py:254): the normal-consistency loss must not gain
        # a gradient path through the opacity accumulator.
        import jax

        dn, _ = depth_to_normal(rays, surf_depth)
        frame["depth_normal"] = dn * jax.lax.stop_gradient(out.alpha)[..., None]
    return frame


def render_view_rebind(
    camera: Camera,
    rays: Optional[jnp.ndarray],
    binned,                        # BinnedView from render_view(return_binned)
    centers: jnp.ndarray,          # [N, 3] — SAME geometry as the first render
    shs: jnp.ndarray,              # [N, SH, 3] updated coefficients
    opacity_raw: jnp.ndarray,      # [N] or [N,1] pre-sigmoid (original)
    keep_mask: jnp.ndarray,        # [N] bool — False entries render as absent
    scaling_raw: jnp.ndarray,
    rotation_raw: jnp.ndarray,
    bg_color: jnp.ndarray,
    cfg: RasterizeConfig,
    depth_ratio: float = 0.0,
):
    """Re-render a view whose geometry (centers/scales/rotations) is
    unchanged but whose SH/opacity-mask differ — the LaRa fine stage
    (lightning/network.py:502-525, which re-runs the whole CUDA pipeline;
    here only SH eval + a color repack + blend run). `keep_mask` reproduces
    the reference's -1e4-logit disabling of deselected surfels."""
    opacity = opacity_activation(opacity_raw.reshape(-1))
    opacity = jnp.where(keep_mask, opacity, 0.0)
    out = rasterize_rebind(
        binned, centers.astype(jnp.float32), shs.astype(jnp.float32),
        opacity, scaling_activation(scaling_raw),
        rotation_activation(rotation_raw), camera,
        bg_color.astype(jnp.float32), cfg)
    image = jnp.clip(out.image, 0.0, 1.0)
    return _postprocess(out, image, camera, rays, depth_ratio)
