"""Front-to-back alpha compositing of depth-sorted surfel entries.

This is the math of the CUDA rasterizer's per-tile forward loop
(SURVEY.md §2.3 step 3) re-expressed for a vector machine: instead of a
sequential march with early exit, transmittance is an exclusive cumulative
product (computed as an exp of a cumulative-sum of log(1-α)) and every
accumulator (color, depth expectation, median, normal, distortion) becomes a
masked weighted reduction over the entry axis. Entries past the point where
transmittance would drop below `transmittance_min` are masked out — exactly
the set the sequential CUDA loop never processes — so results match the
early-terminating reference bit-for-bit up to float associativity.

Shared by the `reference` and `tiled` backends and by the Pallas kernels'
VJP checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lara_tpu.ops.rasterizer.types import ProjectedSurfels, RasterizeConfig


def surfel_alpha(
    g: ProjectedSurfels,      # gathered, leading axis K, front-to-back order
    entry_valid: jnp.ndarray,  # [K] bool
    pix_xy: jnp.ndarray,      # [P, 2] pixel coords (centers at +0.5)
    pix_dir: jnp.ndarray,     # [P, 3] camera-space ray directions (z = 1)
    cfg: RasterizeConfig,
):
    """Ray–surfel intersection + Gaussian falloff for K entries × P pixels.

    Returns (alpha [K,P], depth [K,P]). The intersection solves
    c + u·(s_u t_u) + v·(s_v t_v) = t·d in camera space; because the tangent
    axes are orthogonal, u = (X−c)·t_u/s_u directly in σ units (au = t_u/s_u
    precomputed). The object-space low-pass of 2DGS (min of the 3D ray-space
    falloff and a σ²=1/2 px screen-space falloff) is applied, and the depth
    switches to the center depth when the 2D branch wins.
    """
    # Per-entry dot products with the (shared) pixel rays.
    nd = jnp.einsum("kc,pc->kp", g.normal, pix_dir, precision=jax.lax.Precision.HIGHEST)      # [K,P]
    nc = jnp.sum(g.normal * g.center_cam, axis=-1)       # [K]
    nd_safe = jnp.where(jnp.abs(nd) < 1e-8, 1e-8, nd)
    t = nc[:, None] / nd_safe                            # ray depth of the hit

    dau = jnp.einsum("kc,pc->kp", g.au, pix_dir, precision=jax.lax.Precision.HIGHEST)
    dbv = jnp.einsum("kc,pc->kp", g.bv, pix_dir, precision=jax.lax.Precision.HIGHEST)
    cau = jnp.sum(g.au * g.center_cam, axis=-1)
    cbv = jnp.sum(g.bv * g.center_cam, axis=-1)
    u = t * dau - cau[:, None]
    v = t * dbv - cbv[:, None]
    rho3d = u * u + v * v
    rho3d = jnp.where(jnp.abs(nd) < 1e-8, jnp.inf, rho3d)

    d2 = jnp.sum((pix_xy[None, :, :] - g.center2d[:, None, :]) ** 2, axis=-1)
    rho2d = cfg.filter2d_invsq * d2

    use3d = rho3d <= rho2d
    rho = jnp.where(use3d, rho3d, rho2d)
    depth = jnp.where(use3d, t, g.depth[:, None])

    alpha = jnp.minimum(0.99, g.opacity[:, None] * jnp.exp(-0.5 * rho))
    keep = (
        (alpha >= cfg.alpha_min)
        & (depth >= cfg.near_cull)
        & entry_valid[:, None]
        & g.valid[:, None]
    )
    return jnp.where(keep, alpha, 0.0), depth


def composite(
    g: ProjectedSurfels,
    entry_valid: jnp.ndarray,
    pix_xy: jnp.ndarray,
    pix_dir: jnp.ndarray,
    bg: jnp.ndarray,          # [3]
    cfg: RasterizeConfig,
):
    """Composite K depth-sorted entries over P pixels.

    Returns a dict of per-pixel maps: image [P,3], alpha [P],
    depth_expected (unnormalized accumulator) [P], depth_median [P],
    normal [P,3] (camera space), distortion [P].
    """
    alpha, depth = surfel_alpha(g, entry_valid, pix_xy, pix_dir, cfg)  # [K,P]

    log_t = jnp.log1p(-alpha)                       # log(1-α), α ≤ 0.99
    cum = jnp.cumsum(log_t, axis=0)
    t_excl = jnp.exp(cum - log_t)                   # transmittance before k
    # Early-termination mask: the CUDA loop stops *before* blending the entry
    # that would push transmittance below the threshold.
    live = t_excl * (1.0 - alpha) >= cfg.transmittance_min
    w = jnp.where(live, alpha * t_excl, 0.0)        # [K,P]

    acc_alpha = jnp.sum(w, axis=0)                  # [P]
    image = jnp.einsum("kp,kc->pc", w, g.rgb) + (1.0 - acc_alpha)[:, None] * bg[None, :]

    depth_acc = jnp.sum(w * depth, axis=0)
    normal = jnp.einsum("kp,kc->pc", w, g.normal)

    # Median depth: entry at which accumulated opacity crosses 0.5 — the last
    # contributing entry whose pre-transmittance still exceeds 0.5.
    k_idx = jnp.arange(alpha.shape[0], dtype=jnp.int32)[:, None]
    med_mask = (t_excl > 0.5) & (w > 0.0)
    med_idx = jnp.max(jnp.where(med_mask, k_idx, -1), axis=0)        # [P]
    med_depth = jnp.take_along_axis(depth, jnp.maximum(med_idx, 0)[None, :], axis=0)[0]
    depth_median = jnp.where(med_idx >= 0, med_depth, 0.0)

    # Depth distortion (2DGS): sum_{i<j} w_i w_j |m_i − m_j| accumulated
    # incrementally with running moments; depths are mapped to [0,1] with the
    # fixed near/far constants the upstream kernel uses.
    nrm = cfg.dist_far / (cfg.dist_far - cfg.dist_near)
    m = nrm * (1.0 - cfg.dist_near / jnp.maximum(depth, 1e-6))
    m = jnp.where(w > 0.0, m, 0.0)
    a_excl = jnp.cumsum(w, axis=0) - w
    m1_excl = jnp.cumsum(w * m, axis=0) - w * m
    m2_excl = jnp.cumsum(w * m * m, axis=0) - w * m * m
    distortion = jnp.sum(w * (m * m * a_excl + m2_excl - 2.0 * m * m1_excl), axis=0)

    return {
        "image": image,
        "alpha": acc_alpha,
        "depth_expected": depth_acc,
        "depth_median": depth_median,
        "normal": normal,
        "distortion": distortion,
    }


def normalize_outputs(out: dict, cfg: RasterizeConfig) -> dict:
    """Alpha-normalize the expected depth (lightning/renderer_2dgs.py:237-239,
    nan-safe) — shared by all backends."""
    alpha = out["alpha"]
    out = dict(out)
    out["depth_expected"] = jnp.where(alpha > 1e-6, out["depth_expected"] / jnp.maximum(alpha, 1e-6), 0.0)
    return out


def pixel_rays(cfg: RasterizeConfig, tanfovx, tanfovy, pix_xy: jnp.ndarray):
    """Camera-space ray directions (z=1) through the given pixel coords."""
    fx = cfg.width / (2.0 * tanfovx)
    fy = cfg.height / (2.0 * tanfovy)
    dx = (pix_xy[:, 0] - cfg.width / 2.0) / fx
    dy = (pix_xy[:, 1] - cfg.height / 2.0) / fy
    return jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)
