"""Pallas TPU kernel: per-tile surfel compositing with early termination.

The XLA `tiled` backend must always process its full per-tile entry budget;
this kernel reproduces the CUDA rasterizer's key performance property
(SURVEY.md §2.3 step 3): each 16×16 tile walks its depth-sorted entry list
in chunks and STOPS as soon as every pixel's transmittance is saturated —
for opaque objects that is typically after 1-2 chunks of 32 instead of 256
entries. TPU grid steps run sequentially on the core, so the per-tile
`while_loop` is a genuine early exit, not a masked lockstep.

Layout: pixels live on the lane axis (P = tile² = 256 = 2×128 lanes),
chunk entries on the sublane axis (32); exclusive log-transmittance
cumulative sums are (32×32)·(32×256) lower-triangular matmuls on the MXU.

Numerics match lara_tpu.ops.rasterizer.blend.composite exactly (same alpha
thresholds, per-pixel termination rule, median/distortion accumulators);
the equivalence test is tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lara_tpu.ops.rasterizer.types import RasterizeConfig

CHUNK = 32          # entries composited per inner step
NUM_CHANNELS = 10   # rgb3 + alpha + depth_exp + depth_med + normal3 + dist


def _blend_kernel(counts_ref, scalars_ref, entries_ref, out_ref, *, cfg: RasterizeConfig):
    """Grid: (T,). entries_ref [1, K, 20] VMEM; out_ref [1, NUM_CHANNELS, P]."""
    t = pl.program_id(0)
    k_budget = cfg.tile_budget
    p = cfg.tile * cfg.tile

    n = jnp.minimum(counts_ref[t], k_budget)
    tanx = scalars_ref[0]
    tany = scalars_ref[1]
    bg_r, bg_g, bg_b = scalars_ref[2], scalars_ref[3], scalars_ref[4]

    # pixel coordinates of this tile, P on the lane axis
    ty = (t // cfg.tiles_x).astype(jnp.float32)
    tx = (t % cfg.tiles_x).astype(jnp.float32)
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    pi = (pid // cfg.tile).astype(jnp.float32)   # row in tile
    pj = (pid % cfg.tile).astype(jnp.float32)    # col in tile
    px = tx * cfg.tile + pj + 0.5                # [1, P]
    py = ty * cfg.tile + pi + 0.5
    fx = cfg.width / (2.0 * tanx)
    fy = cfg.height / (2.0 * tany)
    dx = (px - cfg.width / 2.0) / fx
    dy = (py - cfg.height / 2.0) / fy

    # lower-triangular matmul = per-chunk cumulative sums over the entry axis
    ri = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    l_incl = (ci <= ri).astype(jnp.float32)      # includes diagonal
    l_excl = (ci < ri).astype(jnp.float32)

    kk = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)

    def chunk_body(state):
        (ci_, t_run, acc_a, img_r, img_g, img_b, dsum, nx, ny, nz,
         dist, m1_run, m2_run, med) = state
        k0 = ci_ * CHUNK
        rows = entries_ref[0, pl.ds(k0, CHUNK), :]          # [CHUNK, 13]

        def col(c):
            return rows[:, c:c + 1]                         # [CHUNK, 1]

        cx, cy_, cz = col(0), col(1), col(2)
        au0, au1, au2 = col(3), col(4), col(5)
        bv0, bv1, bv2 = col(6), col(7), col(8)
        rr, gg, bb = col(9), col(10), col(11)
        op = col(12)
        gvalid = op > 0.0

        # derive unit normal (au×bv, flipped toward camera), center depth and
        # screen center from the 13 packed columns (see tiled.pack_surfels)
        n0 = au1 * bv2 - au2 * bv1
        n1 = au2 * bv0 - au0 * bv2
        n2 = au0 * bv1 - au1 * bv0
        inv = jax.lax.rsqrt(n0 * n0 + n1 * n1 + n2 * n2 + 1e-20)
        sgn = jnp.where(cx * n0 + cy_ * n1 + cz * n2 <= 0.0, inv, -inv)
        n0, n1, n2 = n0 * sgn, n1 * sgn, n2 * sgn
        zc = cz
        cz_safe = jnp.where(jnp.abs(cz) < 1e-6, 1e-6, cz)
        c2x = fx * cx / cz_safe + cfg.width / 2.0
        c2y = fy * cy_ / cz_safe + cfg.height / 2.0

        nd = n0 * dx + n1 * dy + n2                          # [CHUNK, P]
        nc = n0 * cx + n1 * cy_ + n2 * cz                    # [CHUNK, 1]
        nd_ok = jnp.abs(nd) >= 1e-8
        nd_safe = jnp.where(nd_ok, nd, 1e-8)
        tt = nc / nd_safe
        dau = au0 * dx + au1 * dy + au2
        dbv = bv0 * dx + bv1 * dy + bv2
        cau = au0 * cx + au1 * cy_ + au2 * cz
        cbv = bv0 * cx + bv1 * cy_ + bv2 * cz
        u = tt * dau - cau
        v = tt * dbv - cbv
        rho3d = jnp.where(nd_ok, u * u + v * v, jnp.inf)
        d2 = (px - c2x) ** 2 + (py - c2y) ** 2
        rho2d = cfg.filter2d_invsq * d2
        use3d = rho3d <= rho2d
        rho = jnp.where(use3d, rho3d, rho2d)
        depth = jnp.where(use3d, tt, zc)

        alpha = jnp.minimum(0.99, op * jnp.exp(-0.5 * rho))
        evalid = (k0 + kk) < n
        keep = (alpha >= cfg.alpha_min) & (depth >= cfg.near_cull) & gvalid & evalid
        alpha = jnp.where(keep, alpha, 0.0)

        log_t = jnp.log1p(-alpha)
        dot32 = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
        cum_in = dot32(l_incl, log_t)                        # inclusive cumsum
        t_excl = t_run * jnp.exp(cum_in - log_t)
        live = t_excl * (1.0 - alpha) >= cfg.transmittance_min
        w = jnp.where(live, alpha * t_excl, 0.0)

        img_r = img_r + jnp.sum(w * rr, 0, keepdims=True)
        img_g = img_g + jnp.sum(w * gg, 0, keepdims=True)
        img_b = img_b + jnp.sum(w * bb, 0, keepdims=True)
        acc_a = acc_a + jnp.sum(w, 0, keepdims=True)
        dsum = dsum + jnp.sum(w * depth, 0, keepdims=True)
        nx = nx + jnp.sum(w * n0, 0, keepdims=True)
        ny = ny + jnp.sum(w * n1, 0, keepdims=True)
        nz = nz + jnp.sum(w * n2, 0, keepdims=True)

        # median: depth of the last contributing entry with t_excl > 0.5
        mmask = (t_excl > 0.5) & (w > 0.0)
        midx = jnp.max(jnp.where(mmask, kk, -1), 0, keepdims=True)   # [1,P]
        onehot = (kk == midx).astype(jnp.float32)
        dsel = jnp.sum(onehot * depth, 0, keepdims=True)
        med = jnp.where(midx >= 0, dsel, med)

        # distortion with running moments
        nrm = cfg.dist_far / (cfg.dist_far - cfg.dist_near)
        m = nrm * (1.0 - cfg.dist_near / jnp.maximum(depth, 1e-6))
        m = jnp.where(w > 0.0, m, 0.0)
        a_excl = acc_a - jnp.sum(w, 0, keepdims=True) + dot32(l_excl, w)
        m1_excl = m1_run + dot32(l_excl, w * m)
        m2_excl = m2_run + dot32(l_excl, w * m * m)
        dist = dist + jnp.sum(w * (m * m * a_excl + m2_excl - 2.0 * m * m1_excl),
                              0, keepdims=True)
        m1_run = m1_run + jnp.sum(w * m, 0, keepdims=True)
        m2_run = m2_run + jnp.sum(w * m * m, 0, keepdims=True)

        t_run = t_run * jnp.exp(jnp.sum(log_t, 0, keepdims=True))
        return (ci_ + 1, t_run, acc_a, img_r, img_g, img_b, dsum,
                nx, ny, nz, dist, m1_run, m2_run, med)

    def chunk_cond(state):
        ci_, t_run = state[0], state[1]
        more = ci_ * CHUNK < n
        alive = jnp.max(t_run) >= cfg.transmittance_min
        return jnp.logical_and(more, alive)

    zero = jnp.zeros((1, p), jnp.float32)
    one = jnp.ones((1, p), jnp.float32)
    init = (jnp.int32(0), one, zero, zero, zero, zero, zero,
            zero, zero, zero, zero, zero, zero, zero)
    (_, t_run, acc_a, img_r, img_g, img_b, dsum,
     nx, ny, nz, dist, _, _, med) = jax.lax.while_loop(chunk_cond, chunk_body, init)

    rest = 1.0 - acc_a
    out_ref[0, 0, :] = (img_r + rest * bg_r)[0]
    out_ref[0, 1, :] = (img_g + rest * bg_g)[0]
    out_ref[0, 2, :] = (img_b + rest * bg_b)[0]
    out_ref[0, 3, :] = acc_a[0]
    # alpha-normalized expected depth (nan-safe), as the wrapper expects
    out_ref[0, 4, :] = jnp.where(acc_a > 1e-6, dsum / jnp.maximum(acc_a, 1e-6), 0.0)[0]
    out_ref[0, 5, :] = med[0]
    out_ref[0, 6, :] = nx[0]
    out_ref[0, 7, :] = ny[0]
    out_ref[0, 8, :] = nz[0]
    out_ref[0, 9, :] = dist[0]


def blend_tiles_pallas(entries: jnp.ndarray, counts: jnp.ndarray,
                       tanfovx, tanfovy, bg, cfg: RasterizeConfig) -> jnp.ndarray:
    """entries [T, K, 20] (per-tile depth-sorted windows), counts [T] int32.
    Returns [T, NUM_CHANNELS, P] composited channel maps."""
    t_tiles = cfg.num_tiles
    p = cfg.tile * cfg.tile
    scalars = jnp.stack([
        jnp.asarray(tanfovx, jnp.float32).reshape(()),
        jnp.asarray(tanfovy, jnp.float32).reshape(()),
        bg[0].astype(jnp.float32), bg[1].astype(jnp.float32),
        bg[2].astype(jnp.float32),
    ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # counts, scalars
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, cfg.tile_budget, entries.shape[-1]),
                         lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NUM_CHANNELS, p), lambda t, *_: (t, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_blend_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_tiles, NUM_CHANNELS, p), jnp.float32),
    )(counts, scalars, entries)
