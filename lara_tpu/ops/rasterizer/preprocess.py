"""Per-surfel preprocessing: camera transform, screen bounds, SH color.

Vectorized JAX counterpart of the CUDA rasterizer's preprocess stage
(SURVEY.md §2.3 step 1): build the surfel's camera-space frame from
(mean, 2D scales, quaternion), frustum-cull, compute screen center/radius,
evaluate SH → RGB from the view direction to ``campos``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lara_tpu.utils.camera import Camera
from lara_tpu.utils.quat import quat_to_rotmat
from lara_tpu.utils.sh import eval_sh_color
from lara_tpu.ops.rasterizer.types import ProjectedSurfels, RasterizeConfig


def preprocess_surfels(
    means3d: jnp.ndarray,    # [N, 3] world centers
    shs: jnp.ndarray,        # [N, (deg+1)^2, 3]
    opacities: jnp.ndarray,  # [N] activated (sigmoid applied)
    scales: jnp.ndarray,     # [N, 2] activated (exp applied)
    rotations: jnp.ndarray,  # [N, 4] quaternions (w,x,y,z), any norm
    camera: Camera,
    cfg: RasterizeConfig,
    return_overflow: bool = False,
):
    """With return_overflow, also returns the fraction of valid surfels
    whose UNclamped footprint exceeds cfg.max_radius — those lose coverage
    (and gradient) outside their dup×dup tile ring, unlike the CUDA binning
    which claims arbitrarily many tiles (SURVEY §2.3 step 2). Expected ≈ 0
    at trained statistics; bench.py logs it, tests bound the error."""
    f32 = jnp.float32
    means3d = means3d.astype(f32)
    scales = scales.astype(f32)

    R_w = quat_to_rotmat(rotations.astype(f32))            # [N,3,3]
    R_wc = camera.w2c[:3, :3].astype(f32)
    t_wc = camera.w2c[:3, 3].astype(f32)

    center_cam = means3d @ R_wc.T + t_wc                   # [N,3]
    axes_cam = jnp.einsum("ij,njk->nik", R_wc, R_w, precision=jax.lax.Precision.HIGHEST)        # [N,3,3]
    unit_u, unit_v, normal = axes_cam[..., 0], axes_cam[..., 1], axes_cam[..., 2]

    s_u = jnp.maximum(scales[:, 0], 1e-8)
    s_v = jnp.maximum(scales[:, 1], 1e-8)
    # Offsets dotted with au/bv land directly in σ units of the splat frame.
    au = unit_u / s_u[:, None]
    bv = unit_v / s_v[:, None]

    # Flip the normal toward the camera (2DGS preprocess convention:
    # sign of -dot(p_view, t_w)).
    cosang = -jnp.sum(center_cam * normal, axis=-1)
    normal = normal * jnp.where(cosang >= 0, 1.0, -1.0)[:, None]

    # Screen projection (pixel centers at u+0.5 ⇔ principal point at W/2).
    z = center_cam[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    fx = cfg.width / (2.0 * camera.tanfovx)
    fy = cfg.height / (2.0 * camera.tanfovy)
    cx2d = fx * center_cam[:, 0] / z_safe + cfg.width / 2.0
    cy2d = fy * center_cam[:, 1] / z_safe + cfg.height / 2.0
    center2d = jnp.stack([cx2d, cy2d], axis=-1)

    # Conservative screen radius: project the ±3σ extremes of both tangent
    # axes and take the max pixel offset, plus the low-pass filter footprint.
    def _proj(p):  # [N,3] camera space -> [N,2] pixels
        pz = jnp.maximum(p[:, 2], 1e-3)
        return jnp.stack(
            [fx * p[:, 0] / pz + cfg.width / 2.0,
             fy * p[:, 1] / pz + cfg.height / 2.0],
            axis=-1,
        )

    # Opacity-aware cutoff: the blend drops entries with
    # α = op·exp(-ρ/2) < alpha_min, so any pixel beyond
    # σ·sqrt(2·ln(op/alpha_min)) can never contribute — shrinking the claimed
    # footprint for translucent surfels is lossless w.r.t. the α-threshold
    # rule and sharply cuts tile pressure from low-opacity "dust"
    # (the CUDA reference uses a fixed 3σ; we take min(3σ, exact cutoff)).
    op_clamped = jnp.clip(opacities, cfg.alpha_min, 0.99)
    cut = jnp.sqrt(jnp.maximum(
        2.0 * jnp.log(op_clamped / cfg.alpha_min), 0.0))
    cut = jnp.minimum(cut, 3.0)

    ext = jnp.zeros_like(z)
    for axis, s in ((unit_u, s_u), (unit_v, s_v)):
        off = (cut * s)[:, None] * axis
        for sgn in (1.0, -1.0):
            d = jnp.abs(_proj(center_cam + sgn * off) - center2d)
            ext = jnp.maximum(ext, jnp.maximum(d[:, 0], d[:, 1]))
    filter_r = cut / jnp.sqrt(cfg.filter2d_invsq)  # cutoff σ of the 2D low-pass
    radius_unclamped = ext + filter_r
    radius = jnp.minimum(radius_unclamped, cfg.max_radius)

    # View-dependent color.
    viewdir = means3d - camera.campos.astype(f32)
    viewdir = viewdir / jnp.maximum(jnp.linalg.norm(viewdir, axis=-1, keepdims=True), 1e-12)
    rgb = eval_sh_color(shs.astype(f32), viewdir, cfg.sh_degree)

    # Frustum cull: behind the near plane or with an off-screen footprint.
    margin = cfg.max_radius
    on_screen = (
        (cx2d > -margin) & (cx2d < cfg.width + margin)
        & (cy2d > -margin) & (cy2d < cfg.height + margin)
    )
    valid = (z > cfg.near_cull) & on_screen & (opacities > cfg.alpha_min)

    g = ProjectedSurfels(
        center_cam=center_cam,
        au=au,
        bv=bv,
        normal=normal,
        rgb=rgb,
        opacity=opacities.astype(f32),
        depth=z,
        center2d=center2d,
        radius=radius,
        valid=valid,
    )
    if return_overflow:
        n_valid = jnp.maximum(jnp.sum(valid.astype(f32)), 1.0)
        overflow = jnp.sum(
            (valid & (radius_unclamped > cfg.max_radius)).astype(f32)) / n_valid
        return g, overflow
    return g
