"""Production tile-based rasterizer backend (pure JAX, static shapes).

TPU-native reformulation of the CUDA binning + per-tile blending stages
(SURVEY.md §2.3 steps 2-3) with no dynamic allocation:

  1. surfels are depth-sorted once per camera and their attributes packed
     into one [N, F] row matrix (single bulk gather instead of 10 small
     ones — TPU gathers are row-DMA bound);
  2. each surfel emits a *fixed* dup×dup fan-out of tile slots — its screen
     radius is clamped so the fan-out always covers the true footprint;
  3. binning is ONE single-key int32 sort of `tile << 19 | depth_rank`
     (tile ≤ 2^11 incl. sentinel, N ≤ 2^19): sorting the packed key groups
     entries by tile *and* orders them by depth within the tile in the same
     pass — the XLA equivalent of the CUDA radix sort over (tileID|depth)
     keys; per-tile ranges come from searchsorted on the raw keys;
  4. every tile gathers its first `tile_budget` entries (the nearest ones —
     overflow drops the farthest, which early termination would almost
     always have skipped anyway) and composites them with the vectorized
     cumulative-transmittance blend from blend.py.

Fully differentiable by JAX autodiff: gradients flow to all surfel
parameters through the gathers; the binning indices are integer-valued and
treated as fixed, exactly like the CUDA backward.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from lara_tpu.utils.camera import Camera
from lara_tpu.ops.rasterizer.blend import composite, normalize_outputs, pixel_rays
from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels
from lara_tpu.ops.rasterizer.types import ProjectedSurfels, RasterizeConfig, RenderOutput

_GIDX_BITS = 19  # supports N ≤ 524288 surfels (64³·K=2, the LaRa maximum)


class BinnedView(NamedTuple):
    """Per-view binning state, reusable across re-renders of the SAME
    geometry with different colors/opacities (the LaRa fine stage,
    lightning/network.py:502-525, only swaps SH coefficients on a surfel
    subset — the reference pays preprocess+binning twice for identical
    geometry; caching it here makes the fine re-render color-only).

    packed:      [V, 13] depth-compacted packed rows (coarse colors);
                 columns 0:9 are pure geometry (center_cam, au, bv).
    order_v:     [V] original surfel row per compacted row.
    inv_order:   [N] compacted position of each original row (≥ V when
                 dropped), or None outside take_rows "inv" mode.
    win_gidx:    [T, K] per-tile entry windows (indices into packed rows).
    entry_valid: [T, K] window-entry validity.
    counts:      [T] per-tile entry counts (≤ K).
    valid:       [N] preprocess validity (frustum ∧ opacity) — re-renders
                 must mask their opacity with it like pack_surfels did.
    """

    packed: jnp.ndarray
    order_v: jnp.ndarray
    inv_order: Optional[jnp.ndarray]
    win_gidx: jnp.ndarray
    entry_valid: jnp.ndarray
    counts: jnp.ndarray
    valid: jnp.ndarray

    def repack_colors(self, rgb: jnp.ndarray, opacity: jnp.ndarray) -> jnp.ndarray:
        """New packed rows with the cached geometry columns and fresh
        color/opacity columns: one [V, 4] row gather instead of the full
        preprocess → pack → sort pipeline. `opacity` is activated; the
        preprocess validity mask is applied here (pack_surfels contract)."""
        cols = jnp.concatenate(
            [rgb.astype(jnp.float32),
             jnp.where(self.valid, opacity.astype(jnp.float32), 0.0)[:, None]],
            axis=-1)
        cols_v = take_rows(cols, self.order_v, self.inv_order)
        return jnp.concatenate([self.packed[:, :9], cols_v], axis=-1)


from lara_tpu.ops.gather import take_rows, window_gather  # noqa: F401 (re-export)

PACK_COLS = 13


def pack_surfels(g: ProjectedSurfels) -> jnp.ndarray:
    """SoA → one [N, 13] f32 row matrix. TPU gathers are element-count bound,
    so derivable attributes (unit normal, center depth, screen center,
    validity) are NOT stored — the blend recomputes them from
    center/au/bv + camera scalars. Invalid surfels are encoded as opacity 0."""
    return jnp.concatenate([
        g.center_cam, g.au, g.bv, g.rgb,
        jnp.where(g.valid, g.opacity, 0.0)[:, None],
    ], axis=-1)


def unpack_surfels(m: jnp.ndarray, fx, fy, width: float, height: float) -> ProjectedSurfels:
    """Rebuild the full SoA from a packed row block [..., 13]."""
    center = m[..., 0:3]
    au = m[..., 3:6]
    bv = m[..., 6:9]
    # au×bv ∝ the splat unit normal (au = t_u/s_u ⊥ bv = t_v/s_v); flip it
    # toward the camera like the preprocess does.
    n = jnp.cross(au, bv)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, -1, keepdims=True) + 1e-20)
    n = n * jnp.where(jnp.sum(center * n, -1, keepdims=True) <= 0, 1.0, -1.0)
    z = center[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    c2d = jnp.stack([fx * center[..., 0] / z_safe + width / 2.0,
                     fy * center[..., 1] / z_safe + height / 2.0], axis=-1)
    op = m[..., 12]
    return ProjectedSurfels(
        center_cam=center, au=au, bv=bv, normal=n,
        rgb=m[..., 9:12], opacity=op, depth=z, center2d=c2d,
        radius=jnp.zeros_like(z), valid=op > 0.0,
    )


def bin_surfels(g: ProjectedSurfels, cfg: RasterizeConfig):
    """Legacy tuple view of bin_view (kept for profiling tools/tests)."""
    b = bin_view(g, cfg)
    return b.packed, b.win_gidx, b.entry_valid, b.counts


def bin_view(g: ProjectedSurfels, cfg: RasterizeConfig) -> BinnedView:
    """Depth-sort surfels, compact to the nearest `visible_budget` valid ones,
    build packed attributes and the per-tile entry windows."""
    n = g.depth.shape[0]
    v = min(cfg.visible_budget, n) if cfg.visible_budget else n
    assert v <= (1 << _GIDX_BITS), "raise _GIDX_BITS for larger surfel sets"
    assert cfg.num_tiles < (1 << 11)
    order = jnp.argsort(jnp.where(g.valid, g.depth, jnp.inf))
    order_v = jax.lax.slice_in_dim(order, 0, v) if v < n else order
    from lara_tpu.ops import gather as _gather
    inv_order = (jnp.argsort(order) if _gather.TAKE_ROWS_MODE == "inv"
                 else None)
    packed = take_rows(pack_surfels(g), order_v, inv_order)
    c2d = g.center2d[order_v]
    radius = g.radius[order_v]
    valid = g.valid[order_v]
    n = v

    tile = cfg.tile
    tx_lo = jnp.clip(jnp.floor((c2d[:, 0] - radius) / tile), 0, cfg.tiles_x - 1).astype(jnp.int32)
    ty_lo = jnp.clip(jnp.floor((c2d[:, 1] - radius) / tile), 0, cfg.tiles_y - 1).astype(jnp.int32)
    tx_hi = jnp.clip(jnp.floor((c2d[:, 0] + radius) / tile), 0, cfg.tiles_x - 1).astype(jnp.int32)
    ty_hi = jnp.clip(jnp.floor((c2d[:, 1] + radius) / tile), 0, cfg.tiles_y - 1).astype(jnp.int32)

    d = cfg.dup
    si = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0).reshape(-1)
    sj = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1).reshape(-1)
    tx = tx_lo[:, None] + sj[None, :]
    ty = ty_lo[:, None] + si[None, :]
    slot_ok = (tx <= tx_hi[:, None]) & (ty <= ty_hi[:, None]) & valid[:, None]
    tile_id = jnp.where(slot_ok, ty * cfg.tiles_x + tx, cfg.num_tiles)

    gidx = jax.lax.broadcasted_iota(jnp.int32, (n, d * d), 0)
    keys = ((tile_id << _GIDX_BITS) | gidx).reshape(-1)
    sorted_keys = jax.lax.sort(keys)
    m = sorted_keys.shape[0]

    # Keep the dependent gathers in separate XLA computations: fusing the
    # searchsorted → window-keys → row-gather chain serializes the gathers
    # and costs ~3x on TPU (measured 9.6ms fused vs 5ms fissioned).
    sorted_keys = jax.lax.optimization_barrier(sorted_keys)
    tids = (jnp.arange(cfg.num_tiles + 1, dtype=jnp.int32) << _GIDX_BITS)
    bounds = jnp.searchsorted(sorted_keys, tids).astype(jnp.int32)
    starts, ends = bounds[:-1], bounds[1:]
    counts = ends - starts

    k_budget = cfg.tile_budget
    starts = jax.lax.optimization_barrier(starts)
    # Window keys as T contiguous K-wide slices instead of a T·K element
    # gather (one DMA descriptor per tile instead of per element — measured
    # part of a ~3.3 ms stage). Padding with K sentinel keys keeps
    # dynamic_slice from clamping a start below starts[t] when the sentinel
    # tail is shorter than K (then entry k is exactly sorted position
    # starts[t]+k; overhang rows are invalid-marked via counts).
    padded = jnp.concatenate(
        [sorted_keys, jnp.full((k_budget,), jnp.iinfo(jnp.int32).max, jnp.int32)])
    win_keys = jax.vmap(
        lambda s: jax.lax.dynamic_slice(padded, (s,), (k_budget,)))(starts)
    win_keys = jax.lax.optimization_barrier(win_keys)            # [T, K]
    win_gidx = win_keys & ((1 << _GIDX_BITS) - 1)
    counts = jnp.minimum(counts, k_budget)
    entry_valid = jnp.arange(k_budget, dtype=jnp.int32)[None, :] < counts[:, None]
    return BinnedView(packed=packed, order_v=order_v, inv_order=inv_order,
                      win_gidx=win_gidx, entry_valid=entry_valid,
                      counts=counts, valid=g.valid)


def rasterize_tiled(
    means3d, shs, opacities, scales, rotations,
    camera: Camera, bg: jnp.ndarray, cfg: RasterizeConfig,
    return_binned: bool = False,
):
    g = preprocess_surfels(means3d, shs, opacities, scales, rotations, camera, cfg)
    binned = bin_view(g, cfg)
    out = blend_binned_tiled(binned.packed, binned, camera, bg, cfg)
    return (out, binned) if return_binned else out


def blend_binned_tiled(
    packed: jnp.ndarray, binned: BinnedView,
    camera: Camera, bg: jnp.ndarray, cfg: RasterizeConfig,
) -> RenderOutput:
    """Composite from an existing binning. `packed` is either
    `binned.packed` (first render) or `binned.repack_colors(...)` output
    (re-render of the same geometry with new colors)."""
    win_gidx, entry_valid = binned.win_gidx, binned.entry_valid

    # one bulk row gather: [T, K, 13]
    entries = window_gather(
        packed, jax.lax.optimization_barrier(win_gidx), entry_valid,
        cfg.dup * cfg.dup)

    tile = cfg.tile
    pi = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 0).reshape(-1)
    pj = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 1).reshape(-1)

    fx = cfg.width / (2.0 * camera.tanfovx)
    fy = cfg.height / (2.0 * camera.tanfovy)

    def blend_one_tile(tile_id, rows, valid):
        gk = unpack_surfels(rows, fx, fy, cfg.width, cfg.height)
        ty = (tile_id // cfg.tiles_x).astype(jnp.float32)
        tx = (tile_id % cfg.tiles_x).astype(jnp.float32)
        pix_xy = jnp.stack([tx * tile + pj + 0.5, ty * tile + pi + 0.5], axis=-1)
        pix_dir = pixel_rays(cfg, camera.tanfovx, camera.tanfovy, pix_xy)
        return composite(gk, valid, pix_xy, pix_dir, bg, cfg)

    chunk = min(cfg.tile_chunk, cfg.num_tiles)
    assert cfg.num_tiles % chunk == 0
    tile_ids = jnp.arange(cfg.num_tiles, dtype=jnp.int32).reshape(-1, chunk)
    entries_c = entries.reshape(-1, chunk, cfg.tile_budget, entries.shape[-1])
    valid_c = entry_valid.reshape(-1, chunk, cfg.tile_budget)

    # Rematerialize per-chunk intermediates in the backward pass: the [K,P]
    # alpha/transmittance tensors dominate memory and are cheap to recompute.
    blend_chunk = jax.checkpoint(jax.vmap(blend_one_tile))

    def scan_body(_, inp):
        ids, rows, valid = inp
        return None, blend_chunk(ids, rows, valid)

    _, out = jax.lax.scan(scan_body, None, (tile_ids, entries_c, valid_c))
    out = jax.tree.map(lambda a: a.reshape(cfg.num_tiles, *a.shape[2:]), out)
    out = normalize_outputs(out, cfg)

    def to_image(a):  # [T, P, ...] -> [H, W, ...]
        ch = a.shape[2:]
        a = a.reshape(cfg.tiles_y, cfg.tiles_x, tile, tile, *ch)
        a = jnp.swapaxes(a, 1, 2)
        return a.reshape(cfg.height, cfg.width, *ch)

    return RenderOutput(
        image=to_image(out["image"]),
        alpha=to_image(out["alpha"]),
        depth_expected=to_image(out["depth_expected"]),
        depth_median=to_image(out["depth_median"]),
        normal=to_image(out["normal"]),
        distortion=to_image(out["distortion"]),
    )
