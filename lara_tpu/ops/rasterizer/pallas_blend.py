"""Pallas TPU kernels: per-tile surfel compositing, forward + backward.

The XLA `tiled` backend must always process its full per-tile entry budget;
these kernels reproduce the CUDA rasterizer's key performance property
(SURVEY.md §2.3 steps 3-4): each 16×16 tile walks its depth-sorted entry
list in chunks of `cfg.pallas_chunk` and STOPS as soon as every pixel's
transmittance is saturated. TPU grid steps run sequentially on the core, so
the per-tile `while_loop` is a genuine early exit. Several tiles are
processed per grid step (`cfg.pallas_tiles_per_step`) to amortize the
per-step DMA/pipeline overhead.

Under jax.grad, the backward kernel replays each tile's forward chunk walk
in-kernel (carry-ins stashed in VMEM scratch — ~8 KB, never leaving the
chip), then runs the reverse chunk loop computing per-entry gradients with
`jax.vjp` of the shared per-chunk function — forward/backward math can
never drift apart. The early-exit bound applies to the backward as well.

Layout: pixels on the lane axis (P = tile² = 256 = 2×128 lanes), chunk
entries on the sublane axis; the exclusive log-transmittance cumsum is a
(C×C)·(C×256) lower-triangular matmul on the MXU.

The kernels emit *raw accumulators* (no background blend, unnormalized
depth); `pallas.py` applies those as differentiable XLA ops. Equivalence
with blend.py is tested in tests/test_pallas.py (values + gradients).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lara_tpu.ops.rasterizer.types import RasterizeConfig

NUM_CHANNELS = 10   # rgb3 + alpha + depth_sum + depth_med + normal3 + dist
PACK_COLS = 13


def _dotf(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _prefix_incl(x):
    """Inclusive prefix sum along axis -2 (the chunk-entry axis) as
    log2(C) shifted adds (Hillis–Steele). Replaces a lower-triangular
    [C,C]@[C,P] fp32-HIGHEST matmul: exact f32 (different addition order
    only), ~20× fewer ops, and its autodiff transpose is the mirrored
    shift chain — no MXU multi-pass in either direction."""
    c = x.shape[-2]
    d = 1
    while d < c:
        shifted = jax.lax.slice_in_dim(x, 0, c - d, axis=-2)
        zeros = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, d, axis=-2))
        x = x + jnp.concatenate([zeros, shifted], axis=-2)
        d *= 2
    return x


def _prefix_excl_prod(x):
    """EXCLUSIVE prefix product along axis -2 via Hillis–Steele shifted
    multiplies. Used by pallas_cumsum="prod" to track transmittance
    multiplicatively (T ← T·(1−α), exactly the CUDA loop's recurrence) —
    eliminates the log1p and the exp(cumsum) of the log-domain
    formulation: 2 of the 3 transcendentals per entry-pixel, in the
    forward AND in its VJP."""
    c = x.shape[-2]
    one = jnp.ones_like(jax.lax.slice_in_dim(x, 0, 1, axis=-2))
    x = jnp.concatenate([one, jax.lax.slice_in_dim(x, 0, c - 1, axis=-2)],
                        axis=-2)
    d = 1
    while d < c:
        shifted = jax.lax.slice_in_dim(x, 0, c - d, axis=-2)
        ones = jnp.ones_like(jax.lax.slice_in_dim(x, 0, d, axis=-2))
        x = x * jnp.concatenate([ones, shifted], axis=-2)
        d *= 2
    return x


def _tiles_per_step(cfg: RasterizeConfig) -> int:
    tpg = min(cfg.pallas_tiles_per_step, cfg.num_tiles)
    while cfg.num_tiles % tpg:
        tpg -= 1
    return tpg


class _TileConsts(NamedTuple):
    px: jnp.ndarray   # [1, P] pixel x coords
    py: jnp.ndarray   # [1, P]
    dx: jnp.ndarray   # [1, P] camera-space ray x/z
    dy: jnp.ndarray   # [1, P]
    fx: jnp.ndarray   # scalar
    fy: jnp.ndarray   # scalar
    l_incl: jnp.ndarray  # [C, C] lower-triangular (incl. diag)
    l_excl: jnp.ndarray
    kk: jnp.ndarray   # [C, 1] iota


def _tile_consts(t, scalars_ref, cfg: RasterizeConfig) -> _TileConsts:
    """Per-tile constants for scalar tile id `t` (px/py/dx/dy are [1, P]).

    There is deliberately NO tiles-per-step-batched variant: a kernel
    sharing one chunk while_loop across [tpg, C, P] tensors needs per-tile
    count vectors shaped [tpg, 1, 1], and every construction of those hits
    a Mosaic lowering bug on real TPU (jnp.stack(...).reshape is rejected
    by infer-vector-layout as `vector<tpg xi32> -> vector<tpg x1x1xi32>`;
    the splat+select workaround trips `layout.h:320 Check failed:
    arr.size() >= layout_rank(implicit_dim)` and SIGABRTs the compiler).
    Interpret-mode parity always passed, but a mode that cannot compile on
    hardware must not ship — and the measured tiles_per_step sweep was
    flat (2/4/8/16), so the batching had no demonstrated upside."""
    p = cfg.tile * cfg.tile
    c = cfg.pallas_chunk
    tanx, tany = scalars_ref[0], scalars_ref[1]
    ty = (t // cfg.tiles_x).astype(jnp.float32)
    tx = (t % cfg.tiles_x).astype(jnp.float32)
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    pi = (pid // cfg.tile).astype(jnp.float32)
    pj = (pid % cfg.tile).astype(jnp.float32)
    px = tx * cfg.tile + pj + 0.5
    py = ty * cfg.tile + pi + 0.5
    fx = cfg.width / (2.0 * tanx)
    fy = cfg.height / (2.0 * tany)
    ri = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return _TileConsts(
        px=px, py=py,
        dx=(px - cfg.width / 2.0) / fx, dy=(py - cfg.height / 2.0) / fy,
        fx=fx, fy=fy,
        l_incl=(ci <= ri).astype(jnp.float32),
        l_excl=(ci < ri).astype(jnp.float32),
        kk=jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0),
    )


def _chunk_fn(rows, carry, k0, n, tc: _TileConsts, cfg: RasterizeConfig):
    """Composite one chunk of `cfg.pallas_chunk` packed rows.

    rows [C, 13]; carry = (t_run, a_run, m1_run, m2_run) each [1, P].
    Returns (new_carry, partials [9 channels of [1, P]], aux for median).
    Pure in (rows, carry) — the backward kernel takes jax.vjp of it.
    """
    t_run, a_run, m1_run, m2_run = carry

    def col(c):
        return rows[..., c:c + 1]

    cx, cy_, cz = col(0), col(1), col(2)
    au0, au1, au2 = col(3), col(4), col(5)
    bv0, bv1, bv2 = col(6), col(7), col(8)
    rr, gg, bb = col(9), col(10), col(11)
    op = col(12)
    gvalid = op > 0.0

    # derived: unit normal flipped toward camera, center depth, screen center
    n0 = au1 * bv2 - au2 * bv1
    n1 = au2 * bv0 - au0 * bv2
    n2 = au0 * bv1 - au1 * bv0
    inv = jax.lax.rsqrt(n0 * n0 + n1 * n1 + n2 * n2 + 1e-20)
    sgn = jnp.where(cx * n0 + cy_ * n1 + cz * n2 <= 0.0, inv, -inv)
    n0, n1, n2 = n0 * sgn, n1 * sgn, n2 * sgn
    cz_safe = jnp.where(jnp.abs(cz) < 1e-6, 1e-6, cz)
    c2x = tc.fx * cx / cz_safe + cfg.width / 2.0
    c2y = tc.fy * cy_ / cz_safe + cfg.height / 2.0

    nd = n0 * tc.dx + n1 * tc.dy + n2
    nc = n0 * cx + n1 * cy_ + n2 * cz
    nd_ok = jnp.abs(nd) >= 1e-8
    nd_safe = jnp.where(nd_ok, nd, 1e-8)
    tt = nc / nd_safe
    dau = au0 * tc.dx + au1 * tc.dy + au2
    dbv = bv0 * tc.dx + bv1 * tc.dy + bv2
    cau = au0 * cx + au1 * cy_ + au2 * cz
    cbv = bv0 * cx + bv1 * cy_ + bv2 * cz
    u = tt * dau - cau
    v = tt * dbv - cbv
    rho3d = jnp.where(nd_ok, u * u + v * v, jnp.inf)
    d2 = (tc.px - c2x) ** 2 + (tc.py - c2y) ** 2
    rho2d = cfg.filter2d_invsq * d2
    use3d = rho3d <= rho2d
    rho = jnp.where(use3d, rho3d, rho2d)
    depth = jnp.where(use3d, tt, cz)

    alpha = jnp.minimum(0.99, op * jnp.exp(-0.5 * rho))
    evalid = (k0 + tc.kk) < n
    keep = (alpha >= cfg.alpha_min) & (depth >= cfg.near_cull) & gvalid & evalid
    alpha = jnp.where(keep, alpha, 0.0)

    def ssum(x):
        return jnp.sum(x, -2, keepdims=True)

    shift = cfg.pallas_cumsum in ("shift", "prod")
    if cfg.pallas_cumsum == "prod":
        # multiplicative transmittance (the CUDA recurrence T ← T·(1−α)):
        # no log1p, no exp-of-cumsum — the Gaussian exp is the only
        # transcendental left per entry-pixel
        one_m = 1.0 - alpha
        t_excl = t_run * _prefix_excl_prod(one_m)
        t_out = t_excl * one_m  # inclusive: reused for carry-out row below
        live = t_out >= cfg.transmittance_min
        w = jnp.where(live, alpha * t_excl, 0.0)
        new_t_run = jax.lax.slice_in_dim(t_out, one_m.shape[-2] - 1,
                                         one_m.shape[-2], axis=-2)
    else:
        log_t = jnp.log1p(-alpha)
        cum_in = _prefix_incl(log_t) if shift else _dotf(tc.l_incl, log_t)
        t_excl = t_run * jnp.exp(cum_in - log_t)
        live = t_excl * (1.0 - alpha) >= cfg.transmittance_min
        w = jnp.where(live, alpha * t_excl, 0.0)
        new_t_run = t_run * jnp.exp(ssum(log_t))

    img_r, img_g, img_b = ssum(w * rr), ssum(w * gg), ssum(w * bb)
    a_add = ssum(w)
    dsum = ssum(w * depth)
    nx, ny, nz = ssum(w * n0), ssum(w * n1), ssum(w * n2)

    nrm_c = cfg.dist_far / (cfg.dist_far - cfg.dist_near)
    m = nrm_c * (1.0 - cfg.dist_near / jnp.maximum(depth, 1e-6))
    m = jnp.where(w > 0.0, m, 0.0)
    wm, wm2 = w * m, w * m * m
    if shift:
        a_excl = a_run + (_prefix_incl(w) - w)
        m1_excl = m1_run + (_prefix_incl(wm) - wm)
        m2_excl = m2_run + (_prefix_incl(wm2) - wm2)
    else:
        a_excl = a_run + _dotf(tc.l_excl, w)
        m1_excl = m1_run + _dotf(tc.l_excl, wm)
        m2_excl = m2_run + _dotf(tc.l_excl, wm2)
    dist = ssum(w * (m * m * a_excl + m2_excl - 2.0 * m * m1_excl))

    new_carry = (
        new_t_run,
        a_run + a_add,
        m1_run + ssum(w * m),
        m2_run + ssum(w * m * m),
    )
    partials = (img_r, img_g, img_b, a_add, dsum, nx, ny, nz, dist)
    aux = (t_excl, w, depth)
    return new_carry, partials, aux


def _init_carry(p):
    zero = jnp.zeros((1, p), jnp.float32)
    return (jnp.ones((1, p), jnp.float32), zero, zero, zero)


def _fwd_one_tile(t, ts, counts_ref, scalars_ref, entries_ref, out_ref,
                  cfg: RasterizeConfig, carr_ref=None):
    """Blend tile `t` (block-local index `ts`). With `carr_ref`
    (pallas_stash_carries) each chunk's carry-in is written out for the
    replay-free backward, and the processed-chunk count goes to the extra
    NUM_CHANNELS row of `out_ref`."""
    p = cfg.tile * cfg.tile
    chunk = cfg.pallas_chunk
    n = jnp.minimum(counts_ref[t], cfg.tile_budget)
    tc = _tile_consts(t, scalars_ref, cfg)
    zero = jnp.zeros((1, p), jnp.float32)

    def body(state):
        ci, carry, acc, med = state
        if carr_ref is not None:
            for j in range(4):
                carr_ref[ts, ci, j, :] = carry[j][0]
        k0 = ci * chunk
        rows = entries_ref[ts, pl.ds(k0, chunk), :]
        new_carry, partials, (t_excl, w, depth) = _chunk_fn(rows, carry, k0, n, tc, cfg)
        acc = tuple(a + pa for a, pa in zip(acc, partials))
        mmask = (t_excl > 0.5) & (w > 0.0)
        midx = jnp.max(jnp.where(mmask, tc.kk, -1), 0, keepdims=True)
        dsel = jnp.sum((tc.kk == midx).astype(jnp.float32) * depth, 0, keepdims=True)
        med = jnp.where(midx >= 0, dsel, med)
        return ci + 1, new_carry, acc, med

    def cond(state):
        ci, carry = state[0], state[1]
        return jnp.logical_and(ci * chunk < n,
                               jnp.max(carry[0]) >= cfg.transmittance_min)

    init = (jnp.int32(0), _init_carry(p), tuple(zero for _ in range(9)), zero)
    n_done, _, acc, med = jax.lax.while_loop(cond, body, init)
    img_r, img_g, img_b, a_acc, dsum, nx, ny, nz, dist = acc
    if carr_ref is not None:
        # rank-1 via a 2D broadcast slice (Mosaic dislikes 1D constants)
        out_ref[ts, NUM_CHANNELS, :] = (
            jnp.ones((1, p), jnp.float32) * n_done.astype(jnp.float32))[0]

    out_ref[ts, 0, :] = img_r[0]
    out_ref[ts, 1, :] = img_g[0]
    out_ref[ts, 2, :] = img_b[0]
    out_ref[ts, 3, :] = a_acc[0]
    out_ref[ts, 4, :] = dsum[0]
    out_ref[ts, 5, :] = med[0]
    out_ref[ts, 6, :] = nx[0]
    out_ref[ts, 7, :] = ny[0]
    out_ref[ts, 8, :] = nz[0]
    out_ref[ts, 9, :] = dist[0]


def _fwd_kernel(counts_ref, scalars_ref, entries_ref, out_ref,
                carr_ref=None, *, cfg: RasterizeConfig, tpg: int):
    for ts in range(tpg):
        t = pl.program_id(0) * tpg + ts
        _fwd_one_tile(t, ts, counts_ref, scalars_ref, entries_ref, out_ref,
                      cfg, carr_ref)


def _bwd_one_tile(t, ts, counts_ref, scalars_ref, entries_ref, carry_scr,
                  cot_ref, grad_ref, cfg: RasterizeConfig,
                  ndone_ref=None, carr_ref=None):
    p = cfg.tile * cfg.tile
    chunk = cfg.pallas_chunk
    k_budget = cfg.tile_budget
    n = jnp.minimum(counts_ref[t], k_budget)
    tc = _tile_consts(t, scalars_ref, cfg)

    grad_ref[ts, :, :] = jnp.zeros((k_budget, PACK_COLS), jnp.float32)

    # Replay the forward chunk walk IN-KERNEL, stashing each chunk's
    # carry-in in VMEM scratch (max_chunks·4·P f32 ≈ 8 KB at chunk 64) —
    # cheaper than a second pallas_call materializing all carries in HBM
    # (extra kernel launch + entries re-read + 2× carries traffic). The
    # while_loop's exit index doubles as the processed-chunk count.
    def fbody(state):
        ci, carry = state
        carry_scr[ci, 0, :] = carry[0][0]
        carry_scr[ci, 1, :] = carry[1][0]
        carry_scr[ci, 2, :] = carry[2][0]
        carry_scr[ci, 3, :] = carry[3][0]
        rows = entries_ref[ts, pl.ds(ci * chunk, chunk), :]
        new_carry, _, _ = _chunk_fn(rows, carry, ci * chunk, n, tc, cfg)
        return ci + 1, new_carry

    def fcond(state):
        ci, carry = state
        return jnp.logical_and(ci * chunk < n,
                               jnp.max(carry[0]) >= cfg.transmittance_min)

    if carr_ref is None:
        n_done, _ = jax.lax.while_loop(fcond, fbody,
                                       (jnp.int32(0), _init_carry(p)))
    else:
        # replay-free: the forward stashed every chunk's carry-in and the
        # processed-chunk count
        n_done = ndone_ref[t]

    cot = tuple(cot_ref[ts, c, :][None, :] for c in (0, 1, 2, 3, 4, 6, 7, 8, 9))

    def bbody(ci_rev, d_carry):
        ci = n_done - 1 - ci_rev
        k0 = ci * chunk
        rows = entries_ref[ts, pl.ds(k0, chunk), :]
        if carr_ref is None:
            carry = tuple(carry_scr[ci, j, :][None, :] for j in range(4))
        else:
            carry = tuple(carr_ref[ts, ci, j, :][None, :] for j in range(4))

        def f(r, c):
            new_carry, partials, _ = _chunk_fn(r, c, k0, n, tc, cfg)
            return new_carry, partials

        _, vjp_fn = jax.vjp(f, rows, carry)
        d_rows, d_carry_in = vjp_fn((d_carry, cot))
        grad_ref[ts, pl.ds(k0, chunk), :] = d_rows
        return d_carry_in

    zero = jnp.zeros((1, p), jnp.float32)
    d_carry0 = (zero, zero, zero, zero)
    jax.lax.fori_loop(0, n_done, bbody, d_carry0)


def _bwd_kernel(counts_ref, scalars_ref, entries_ref, cot_ref,
                grad_ref, carry_scr, *, cfg: RasterizeConfig, tpg: int):
    """cot_ref [tpg, NUM_CHANNELS, P] output cotangents (median's is
    ignored); carry_scr VMEM scratch [max_chunks, 4, P] reused per tile;
    grad_ref [tpg, K, 13] per-entry gradients."""
    for ts in range(tpg):
        t = pl.program_id(0) * tpg + ts
        _bwd_one_tile(t, ts, counts_ref, scalars_ref, entries_ref,
                      carry_scr, cot_ref, grad_ref, cfg)


def _bwd_kernel_stash(counts_ref, ndone_ref, scalars_ref, entries_ref,
                      carr_ref, cot_ref, grad_ref, *,
                      cfg: RasterizeConfig, tpg: int):
    """Replay-free per-tile backward: chunk carry-ins come from the
    forward's stash instead of an in-kernel replay walk."""
    for ts in range(tpg):
        t = pl.program_id(0) * tpg + ts
        _bwd_one_tile(t, ts, counts_ref, scalars_ref, entries_ref,
                      None, cot_ref, grad_ref, cfg,
                      ndone_ref=ndone_ref, carr_ref=carr_ref)


def _run_fwd(entries, counts, scalars, cfg: RasterizeConfig,
             stash: bool = False):
    """Run the forward blend kernel. With `stash`, additionally emits the
    per-chunk carry-ins [T, MC, 4, P] and a processed-chunk-count channel
    (row NUM_CHANNELS of the acc output) for the replay-free backward;
    returns (acc_with_ndone, carries) then."""
    t_tiles = cfg.num_tiles
    p = cfg.tile * cfg.tile
    tpg = _tiles_per_step(cfg)
    max_chunks = cfg.tile_budget // cfg.pallas_chunk
    n_ch = NUM_CHANNELS + 1 if stash else NUM_CHANNELS
    out_specs = pl.BlockSpec((tpg, n_ch, p), lambda t, *_: (t, 0, 0))
    out_shape = jax.ShapeDtypeStruct((t_tiles, n_ch, p), jnp.float32)
    if stash:
        out_specs = [out_specs,
                     pl.BlockSpec((tpg, max_chunks, 4, p),
                                  lambda t, *_: (t, 0, 0, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((t_tiles, max_chunks, 4, p),
                                          jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_tiles // tpg,),
        in_specs=[pl.BlockSpec((tpg, cfg.tile_budget, PACK_COLS),
                               lambda t, *_: (t, 0, 0))],
        out_specs=out_specs,
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, tpg=tpg),
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(counts, scalars, entries)


def _run_bwd(entries, counts, scalars, cot, cfg: RasterizeConfig):
    t_tiles = cfg.num_tiles
    p = cfg.tile * cfg.tile
    max_chunks = cfg.tile_budget // cfg.pallas_chunk
    tpg = _tiles_per_step(cfg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_tiles // tpg,),
        in_specs=[
            pl.BlockSpec((tpg, cfg.tile_budget, PACK_COLS), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((tpg, NUM_CHANNELS, p), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tpg, cfg.tile_budget, PACK_COLS),
                               lambda t, *_: (t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((max_chunks, 4, p), jnp.float32)],
    )

    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, tpg=tpg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_tiles, cfg.tile_budget, PACK_COLS),
                                       jnp.float32),
    )(counts, scalars, entries, cot)


def _run_bwd_stash(entries, counts, ndone, scalars, carries, cot,
                   cfg: RasterizeConfig):
    """Replay-free backward: consumes the forward's stashed carries."""
    t_tiles = cfg.num_tiles
    p = cfg.tile * cfg.tile
    max_chunks = cfg.tile_budget // cfg.pallas_chunk
    tpg = _tiles_per_step(cfg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_tiles // tpg,),
        in_specs=[
            pl.BlockSpec((tpg, cfg.tile_budget, PACK_COLS), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((tpg, max_chunks, 4, p), lambda t, *_: (t, 0, 0, 0)),
            pl.BlockSpec((tpg, NUM_CHANNELS, p), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tpg, cfg.tile_budget, PACK_COLS),
                               lambda t, *_: (t, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel_stash, cfg=cfg, tpg=tpg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_tiles, cfg.tile_budget, PACK_COLS),
                                       jnp.float32),
    )(counts, ndone, scalars, entries, carries, cot)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def blend_tiles_pallas(entries, counts, scalars, cfg: RasterizeConfig):
    """entries [T, K, 13] depth-sorted per-tile windows; counts [T] int32;
    scalars [2] = (tanfovx, tanfovy). Returns raw accumulator maps
    [T, NUM_CHANNELS, P] (no bg blend, unnormalized depth).
    Differentiable w.r.t. `entries` via the Pallas backward kernel
    (median channel's gradient is defined as 0, like the CUDA reference
    which never backprops the median)."""
    return _run_fwd(entries, counts, scalars, cfg)


def _vjp_fwd(entries, counts, scalars, cfg):
    if cfg.pallas_stash_carries:
        acc, carries = _run_fwd(entries, counts, scalars, cfg, stash=True)
        ndone = acc[:, NUM_CHANNELS, 0].astype(jnp.int32)
        # saveable across the per-view render remat: with "stash" in
        # ModelConfig.remat_views_save the backward skips re-running this
        # forward kernel (models/remat.py:views_remat_policy)
        from jax.ad_checkpoint import checkpoint_name
        ndone = checkpoint_name(ndone, "raster_stash")
        carries = checkpoint_name(carries, "raster_stash")
        return acc[:, :NUM_CHANNELS], (entries, counts, scalars,
                                       ndone, carries)
    out = _run_fwd(entries, counts, scalars, cfg)
    return out, (entries, counts, scalars)


def _vjp_bwd(cfg, residuals, cot):
    # The backward kernel replays each tile's forward chunk walk in-kernel
    # (VMEM scratch carries) instead of keeping carries as residuals: 48
    # renders/step would otherwise hold ~400 MB of carries alive across the
    # whole train step (measured OOM at B=3); the replay costs one extra
    # cheap fwd walk per tile, bounded by the same early exit.
    if cfg.pallas_stash_carries:
        entries, counts, scalars, ndone, carries = residuals
        d_entries = _run_bwd_stash(entries, counts, ndone, scalars,
                                   carries, cot, cfg)
    else:
        entries, counts, scalars = residuals
        d_entries = _run_bwd(entries, counts, scalars, cot, cfg)
    return d_entries, None, None


blend_tiles_pallas.defvjp(_vjp_fwd, _vjp_bwd)
