"""Rasterizer correctness: analytic scenes, backend equivalence, gradients.

Implements SURVEY.md §4 test items (b)/(c): the tiled production backend is
validated against the slow per-pixel reference renderer and against
finite-difference gradients on synthetic scenes of analytic surfels.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lara_tpu.utils.camera import Camera, make_camera
from lara_tpu.ops.rasterizer import RasterizeConfig, rasterize
from lara_tpu.ops.rasterizer.reference import rasterize_reference
from lara_tpu.ops.rasterizer.tiled import rasterize_tiled


def front_camera(dist=2.0, fov=0.8, near=0.5, far=4.0):
    """Camera at (0,0,-dist) looking down +z (identity rotation)."""
    c2w = jnp.eye(4).at[2, 3].set(-dist)
    return make_camera(c2w, fov, fov, near, far)


def make_cfg(**kw):
    base = dict(height=64, width=64, tile=16, dup=3, tile_budget=128,
                tile_chunk=8, sh_degree=1, backend="tiled")
    base.update(kw)
    return RasterizeConfig(**base)


def dc_shs(rgb, n):
    """SH coefficients whose degree-0 term reproduces `rgb` exactly."""
    C0 = 0.28209479177387814
    shs = np.zeros((n, 4, 3), np.float32)
    shs[:, 0, :] = (np.asarray(rgb) - 0.5) / C0
    return jnp.asarray(shs)


def random_scene(key, n, extent=0.35, scale_rng=(-4.5, -3.2), op_rng=(-1.0, 3.0)):
    ks = jax.random.split(key, 5)
    means = jax.random.uniform(ks[0], (n, 3), minval=-extent, maxval=extent)
    shs = jax.random.normal(ks[1], (n, 4, 3)) * 0.3
    shs = shs.at[:, 0, :].add(1.0)
    op = jax.random.uniform(ks[2], (n,), minval=op_rng[0], maxval=op_rng[1])
    op = jax.nn.sigmoid(op)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 2), minval=scale_rng[0], maxval=scale_rng[1]))
    quats = jax.random.normal(ks[4], (n, 4))
    return means, shs, op, scales, quats


def test_single_surfel_analytic():
    """One opaque white surfel at the origin facing the camera."""
    cfg = make_cfg()
    cam = front_camera()
    means = jnp.zeros((1, 3))
    shs = dc_shs([1.0, 1.0, 1.0], 1)
    op = jnp.array([0.8])
    scales = jnp.full((1, 2), 0.05)       # large: covers many pixels
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])  # identity: normal = +z (flipped to -z)
    bg = jnp.zeros(3)

    out = rasterize_tiled(means, shs, op, scales, quats, cam, bg, cfg)
    # Center pixel (32,32) samples at (32.5, 32.5) — 0.5px off the projected
    # splat center (32, 32). Analytic alpha = op * exp(-rho/2) with
    # rho = (0.5² + 0.5²) / σ_px² and σ_px = s·f/z.
    cy = cx = 32
    focal = 32.0 / np.tan(0.4)
    sigma_px = 0.05 * focal / 2.0
    rho = (0.25 + 0.25) / sigma_px**2
    expected_alpha = 0.8 * np.exp(-0.5 * rho)
    assert abs(float(out.alpha[cy, cx]) - expected_alpha) < 1e-3
    np.testing.assert_allclose(np.asarray(out.image[cy, cx]), expected_alpha, atol=1e-3)
    # Depth at center = distance camera→surfel = 2.
    assert abs(float(out.depth_expected[cy, cx]) - 2.0) < 1e-3
    # Rendered normal is camera-space, flipped toward the camera (−z).
    n = np.asarray(out.normal[cy, cx]) / max(float(out.alpha[cy, cx]), 1e-6)
    np.testing.assert_allclose(n, [0, 0, -1], atol=2e-2)
    # Far corners: background.
    assert float(out.alpha[2, 2]) < 1e-3


def test_two_surfels_compositing_order():
    """Red in front of blue on the optical axis: front-to-back compositing."""
    cfg = make_cfg()
    cam = front_camera()
    means = jnp.array([[0.0, 0.0, -0.2], [0.0, 0.0, 0.2]])  # red nearer (z=-0.2)
    shs = jnp.concatenate([dc_shs([1, 0, 0], 1), dc_shs([0, 0, 1], 1)])
    op = jnp.array([0.6, 0.9])
    scales = jnp.full((2, 2), 0.08)
    quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
    bg = jnp.zeros(3)

    out = rasterize_tiled(means, shs, op, scales, quats, cam, bg, cfg)
    px = np.asarray(out.image[32, 32])
    # red: w = 0.6; blue: 0.4 * 0.9 = 0.36
    np.testing.assert_allclose(px, [0.6, 0.0, 0.36], atol=2e-2)
    assert abs(float(out.alpha[32, 32]) - 0.96) < 2e-2
    # Accumulated opacity crosses 0.5 already at the red surfel (w≈0.59), so
    # the median depth is red's depth: 2 − 0.2 = 1.8.
    assert abs(float(out.depth_median[32, 32]) - 1.8) < 5e-3


def test_tiled_matches_reference():
    cfg = make_cfg(tile_budget=512)
    cam = front_camera()
    means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(0), 400)
    bg = jnp.array([1.0, 1.0, 1.0])

    ref = rasterize_reference(means, shs, op, scales, quats, cam, bg, cfg)
    til = rasterize_tiled(means, shs, op, scales, quats, cam, bg, cfg)

    np.testing.assert_allclose(np.asarray(til.image), np.asarray(ref.image), atol=1e-4)
    np.testing.assert_allclose(np.asarray(til.alpha), np.asarray(ref.alpha), atol=1e-4)
    np.testing.assert_allclose(np.asarray(til.depth_expected), np.asarray(ref.depth_expected), atol=1e-3)
    np.testing.assert_allclose(np.asarray(til.depth_median), np.asarray(ref.depth_median), atol=1e-3)
    np.testing.assert_allclose(np.asarray(til.normal), np.asarray(ref.normal), atol=1e-4)
    np.testing.assert_allclose(np.asarray(til.distortion), np.asarray(ref.distortion), atol=1e-4)


def test_tilted_surfel_ray_intersection():
    """A 45°-tilted surfel: the ray-plane intersection must shift depth
    across the splat (left side nearer than right side)."""
    cfg = make_cfg()
    cam = front_camera()
    s = np.sin(np.pi / 8), np.cos(np.pi / 8)
    quats = jnp.array([[s[1], 0.0, s[0], 0.0]])  # 45° about y
    means = jnp.zeros((1, 3))
    out = rasterize_tiled(means, dc_shs([1, 1, 1], 1), jnp.array([0.95]),
                          jnp.full((1, 2), 0.1), quats, cam, jnp.zeros(3), cfg)
    d = np.asarray(out.depth_expected[32])
    a = np.asarray(out.alpha[32])
    cols = np.where(a > 0.5)[0]
    assert len(cols) > 4
    # Monotone depth across the tilted splat.
    dd = d[cols]
    assert (dd[-1] - dd[0]) * np.sign(1.0) != 0
    assert np.all(np.diff(dd) > 0) or np.all(np.diff(dd) < 0)


def test_gradients_tiled_vs_reference_and_fd():
    cfg = make_cfg(tile_budget=512)
    cam = front_camera()
    means, shs, op_a, scales, quats = random_scene(jax.random.PRNGKey(3), 50)
    # keep alphas away from the 0.99 clamp and the alpha_min threshold
    op_raw = jnp.clip(jax.random.normal(jax.random.PRNGKey(4), (50,)), -1.0, 1.0)
    sc_raw = jnp.log(scales)
    bg = jnp.full((3,), 0.5)
    tgt = jax.random.uniform(jax.random.PRNGKey(5), (64, 64, 3))

    def loss(backend_fn, params):
        m, s, o, sc, q = params
        out = backend_fn(m, s, jax.nn.sigmoid(o), jnp.exp(sc), q, cam, bg, cfg)
        return jnp.mean((out.image - tgt) ** 2) + 0.1 * jnp.mean(out.distortion)

    params = (means, shs, op_raw, sc_raw, quats)
    g_ref = jax.grad(lambda p: loss(rasterize_reference, p))(params)
    g_til = jax.grad(lambda p: loss(rasterize_tiled, p))(params)
    for a, b, name in zip(g_ref, g_til, ["means", "shs", "op", "scales", "quats"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)

    # Directional finite difference on the tiled backend.
    f = lambda p: loss(rasterize_tiled, p)
    key = jax.random.PRNGKey(7)
    vec = jax.tree.map(lambda a: jax.random.normal(key, a.shape), params)
    eps = 1e-3
    plus = jax.tree.map(lambda a, v: a + eps * v, params, vec)
    minus = jax.tree.map(lambda a, v: a - eps * v, params, vec)
    fd = (f(plus) - f(minus)) / (2 * eps)
    ad = sum(jnp.sum(g * v) for g, v in zip(jax.grad(f)(params), vec))
    assert abs(float(fd) - float(ad)) < 5e-3 * max(1.0, abs(float(fd)))


def test_vmap_over_cameras():
    cfg = make_cfg()
    means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(1), 100)
    bg = jnp.ones(3)

    def cam_at(angle):
        c, s = jnp.cos(angle), jnp.sin(angle)
        rot = jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        eye = rot @ jnp.array([0.0, 0.0, -2.0])
        z = -eye / jnp.linalg.norm(eye)
        x = jnp.cross(jnp.array([0.0, 1.0, 0.0]), z)
        x = x / jnp.linalg.norm(x)
        y = jnp.cross(z, x)
        c2w = jnp.eye(4).at[:3, 0].set(x).at[:3, 1].set(y).at[:3, 2].set(z).at[:3, 3].set(eye)
        return make_camera(c2w, 0.8, 0.8, 0.5, 4.0)

    cams = jax.vmap(cam_at)(jnp.array([0.0, 0.7, 1.9]))
    render = jax.jit(jax.vmap(
        lambda cam: rasterize_tiled(means, shs, op, scales, quats, cam, bg, cfg).image
    ))
    imgs = render(cams)
    assert imgs.shape == (3, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(imgs)))
    # Different viewpoints → different images.
    assert float(jnp.mean(jnp.abs(imgs[0] - imgs[1]))) > 1e-3


def test_tile_budget_overflow_keeps_nearest():
    """With a tiny budget, results should match keeping only the nearest
    surfels — saturation makes the far ones irrelevant for opaque stacks."""
    cfg_small = make_cfg(tile_budget=16)
    cfg_big = make_cfg(tile_budget=512)
    cam = front_camera()
    n = 64
    # opaque stack along z at the image center
    z = jnp.linspace(-0.3, 0.3, n)
    means = jnp.stack([jnp.zeros(n), jnp.zeros(n), z], -1)
    shs = dc_shs([0.7, 0.2, 0.4], n)
    op = jnp.full((n,), 0.95)
    scales = jnp.full((n, 2), 0.05)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    bg = jnp.zeros(3)
    a = rasterize_tiled(means, shs, op, scales, quats, cam, bg, cfg_small)
    b = rasterize_tiled(means, shs, op, scales, quats, cam, bg, cfg_big)
    # Truncation is exact wherever the first 16 entries already saturate
    # transmittance; low-alpha edge pixels may differ, so compare the core.
    core = np.asarray(a.alpha) > 0.999
    assert core.sum() > 20
    diff = np.abs(np.asarray(a.image) - np.asarray(b.image)).max(-1)
    assert diff[core].max() < 1e-3


def test_api_dispatch():
    cfg = make_cfg(backend="reference")
    cam = front_camera()
    means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(2), 20)
    out = rasterize(means, shs, op, scales, quats, cam, jnp.ones(3), cfg)
    assert out.image.shape == (64, 64, 3)
    with pytest.raises(ValueError):
        rasterize(means, shs, op, scales, quats, cam, jnp.ones(3),
                  dataclasses.replace(cfg, backend="nope"))


def test_visible_budget_noop_when_generous():
    """visible_budget >= visible count must not change outputs or grads."""
    cam = front_camera()
    means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(21), 200)
    bg = jnp.full((3,), 0.1)
    cfg_all = make_cfg(tile_budget=256)
    cfg_v = make_cfg(tile_budget=256, visible_budget=512)

    out_a = rasterize_tiled(means, shs, op, scales, quats, cam, bg, cfg_all)
    out_b = rasterize_tiled(means, shs, op, scales, quats, cam, bg, cfg_v)
    np.testing.assert_allclose(np.asarray(out_b.image), np.asarray(out_a.image),
                               atol=1e-6)

    def loss(cfg, m):
        o = rasterize_tiled(m, shs, op, scales, quats, cam, bg, cfg)
        return jnp.mean(o.image ** 2) + jnp.mean(o.distortion)

    g_a = jax.grad(lambda m: loss(cfg_all, m))(means)
    g_b = jax.grad(lambda m: loss(cfg_v, m))(means)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_a), atol=1e-6)


def test_visible_budget_truncation_keeps_nearest():
    """Overflow drops the farthest surfels: rendering with budget=1 equals
    rendering the nearest surfel alone."""
    cam = front_camera()
    means = jnp.array([[0.0, 0.0, -0.2], [0.0, 0.0, 0.3]])  # near, far
    shs = dc_shs([0.9, 0.2, 0.4], 2)
    op = jnp.array([0.7, 0.9])
    scales = jnp.full((2, 2), 0.05)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    bg = jnp.zeros(3)

    cfg1 = make_cfg(visible_budget=1)
    out = rasterize_tiled(means, shs, op, scales, quats, cam, bg, cfg1)
    out_near = rasterize_tiled(means[:1], shs[:1], op[:1], scales[:1],
                               quats[:1], cam, bg, make_cfg())
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(out_near.image),
                               atol=1e-6)


def test_window_gather_vjp_matches_xla_scatter():
    """window_gather's sort-based backward must equal XLA's gather transpose
    (scatter-add), including adversarial cases: empty tiles whose windows
    overrun into neighbors, end-of-array clamping, and duplicate reads of
    the same row — all invalid-marked, so their cotangents are zero."""
    from lara_tpu.ops.rasterizer.tiled import window_gather

    rng = np.random.default_rng(0)
    v, t, k, f, max_dup = 37, 8, 6, 5, 4
    packed = jnp.asarray(rng.normal(size=(v, f)).astype(np.float32))

    # build windows the way bin_surfels does: sorted positions + overruns
    counts = np.array([0, 3, 6, 0, 0, 2, 6, 1])  # several empty tiles
    m2_rows = int(counts.sum())
    row_gidx = rng.permutation(v)[:m2_rows].astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    win = np.clip(starts[:, None] + np.arange(k)[None, :], 0, m2_rows - 1)
    win_gidx = jnp.asarray(row_gidx[win])
    entry_valid = jnp.asarray(np.arange(k)[None, :] < np.minimum(counts, k)[:, None])

    cot_full = rng.normal(size=(t, k, f)).astype(np.float32)
    # invalid entries receive zero cotangent (the blend masks them out)
    cot = jnp.asarray(cot_full) * entry_valid[..., None]

    def via_custom(p):
        return jnp.sum(window_gather(p, win_gidx, entry_valid, max_dup) * cot)

    def via_xla(p):
        return jnp.sum(p[win_gidx] * cot)

    g_custom = jax.grad(via_custom)(packed)
    g_xla = jax.grad(via_xla)(packed)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_xla),
                               rtol=1e-6, atol=1e-6)


class TestBinnedRebind:
    """Shared-binning re-render (the fine stage's color-only path): a
    rebind with new SH + a keep mask must match a from-scratch render of
    the same geometry with masked opacity (lightning/network.py:502-525
    semantics at a fraction of the cost)."""

    def _scene(self, n=600):
        means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(7), n)
        ks = jax.random.split(jax.random.PRNGKey(8), 2)
        sh2 = shs + jax.random.normal(ks[0], shs.shape) * 0.2
        keep = jax.random.uniform(ks[1], (n,)) < 0.6
        return means, shs, sh2, op, scales, quats, keep

    @pytest.mark.parametrize("backend", ["tiled", "pallas"])
    def test_rebind_matches_scratch(self, backend):
        from lara_tpu.ops.rasterizer import rasterize_and_bin, rasterize_rebind

        means, shs, sh2, op, scales, quats, keep = self._scene()
        # tile_budget must cover every entry of the densest tile: the rebind
        # windows still contain the dropped (zero-opacity) entries, so a
        # tight budget would truncate the two paths differently (documented
        # overflow semantics, not an equivalence bug).
        cfg = make_cfg(backend=backend, tile_budget=2048,
                       pallas_chunk=32, pallas_tiles_per_step=2)
        cam = front_camera()
        bg = jnp.asarray([1.0, 1.0, 1.0])

        kw = {}
        if backend == "pallas":  # CPU run → interpreter mode
            from lara_tpu.ops.rasterizer import pallas_blend  # noqa: F401
            import lara_tpu.ops.rasterizer.pallas_blend as pb
            from jax.experimental import pallas as pl  # noqa: F401
            import functools as ft
            import unittest.mock as mock
            orig = pb.pl.pallas_call
            kw["patch"] = mock.patch.object(
                pb.pl, "pallas_call", ft.partial(orig, interpret=True))

        ctx = kw.get("patch")
        if ctx:
            ctx.start()
        try:
            out_c, binned = rasterize_and_bin(
                means, shs, op, scales, quats, cam, bg, cfg)
            op_fine = jnp.where(keep, op, 0.0)
            out_rebind = rasterize_rebind(
                binned, means, sh2, op_fine, scales, quats, cam, bg, cfg)
            # from-scratch render of the same fine set
            out_scratch = rasterize(
                means, sh2, op_fine, scales, quats, cam, bg, cfg)
        finally:
            if ctx:
                ctx.stop()

        np.testing.assert_allclose(np.asarray(out_rebind.image),
                                   np.asarray(out_scratch.image), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_rebind.alpha),
                                   np.asarray(out_scratch.alpha), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_rebind.depth_expected),
                                   np.asarray(out_scratch.depth_expected),
                                   atol=1e-4)
        # and the coarse output is untouched by the refactor
        out_plain = rasterize(means, shs, op, scales, quats, cam, bg,
                              dataclasses.replace(cfg, backend="tiled"))
        if backend == "tiled":
            np.testing.assert_allclose(np.asarray(out_c.image),
                                       np.asarray(out_plain.image), atol=2e-5)

    def test_rebind_gradients_flow(self):
        """Gradients from a rebind-rendered loss must reach the NEW SH, the
        shared geometry (centers/scales/rotations), and the original
        opacities — through the cached binning."""
        from lara_tpu.ops.rasterizer import rasterize_and_bin, rasterize_rebind

        means, shs, sh2, op, scales, quats, keep = self._scene(n=200)
        cfg = make_cfg(backend="tiled", tile_budget=256)
        cam = front_camera()
        bg = jnp.asarray([0.0, 0.0, 0.0])

        def loss(means_, sh2_, op_, scales_):
            out_c, binned = rasterize_and_bin(
                means_, shs, op_, scales_, quats, cam, bg, cfg)
            out_f = rasterize_rebind(
                binned, means_, sh2_, jnp.where(keep, op_, 0.0), scales_,
                quats, cam, bg, cfg)
            return jnp.mean(out_f.image) + 0.1 * jnp.mean(out_c.image)

        g = jax.grad(loss, argnums=(0, 1, 2, 3))(means, sh2, op, scales)
        for name, gi in zip(["means", "sh2", "op", "scales"], g):
            arr = np.asarray(gi)
            assert np.all(np.isfinite(arr)), name
            assert np.abs(arr).max() > 0, f"no gradient signal to {name}"


def test_radius_overflow_counter_and_truncation_bound():
    """max_radius clamp accounting (VERDICT r2 weak #7): the overflow
    counter measures how many valid surfels claim more than the dup×dup
    ring covers; at trained-statistics scales it must be ~0, and on a
    pathological big-splat scene the tiled-vs-reference truncation error
    must stay bounded while the counter flags the overflow."""
    from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels

    cam = front_camera()
    bg = jnp.asarray([1.0, 1.0, 1.0])

    # trained-like scene: tiny scales → no overflow, backends agree
    means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(3), 300)
    cfg = make_cfg(tile_budget=2048)
    _, overflow = preprocess_surfels(means, shs, op, scales, quats, cam, cfg,
                                     return_overflow=True)
    assert float(overflow) < 0.01

    # pathological: huge splats (radius >> (dup-1)*tile/2 = 16 px)
    big_scales = jnp.full((300, 2), 0.25)
    _, overflow_big = preprocess_surfels(means, shs, op, big_scales, quats,
                                         cam, cfg, return_overflow=True)
    assert float(overflow_big) > 0.5  # the counter must flag it

    out_t = rasterize(means, shs, op, big_scales, quats, cam, bg, cfg)
    out_r = rasterize_reference(means, shs, op, big_scales, quats, cam, bg,
                                dataclasses.replace(cfg, backend="reference"))
    err = np.abs(np.asarray(out_t.image) - np.asarray(out_r.image))
    psnr = -10 * np.log10(np.mean(err ** 2) + 1e-12)
    # truncation loses the far tails only; the bulk must still match
    assert psnr > 20, f"big-splat truncation error too large: {psnr:.1f} dB"


class TestCountingSortBinning:
    """bin_mode="count" (MXU counting-sort windows) must reproduce
    bin_mode="sort" exactly: both orders are depth-stable, so win_gidx,
    counts, and every render output are bit-identical."""

    def _windows(self, n, seed, **cfg_kw):
        from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels
        from lara_tpu.ops.rasterizer.tiled import bin_view

        cam = front_camera()
        means, shs, op, scales, quats = random_scene(
            jax.random.PRNGKey(seed), n)
        outs = {}
        for mode in ("sort", "count"):
            cfg = make_cfg(bin_mode=mode, **cfg_kw)
            g = preprocess_surfels(means, shs, op, scales, quats, cam, cfg)
            outs[mode] = bin_view(g, cfg)
        return outs["sort"], outs["count"]

    @pytest.mark.parametrize("n,kw", [
        (400, {}),                                  # single chunk
        (700, {"tile_budget": 8}),                  # pad + budget overflow
        (900, {"visible_budget": 640}),             # compaction truncation
    ])
    def test_windows_identical(self, n, kw):
        (pa, a), (pb, b) = self._windows(n, seed=3 + n, **kw)
        np.testing.assert_array_equal(np.asarray(a.counts),
                                      np.asarray(b.counts))
        np.testing.assert_array_equal(np.asarray(a.entry_valid),
                                      np.asarray(b.entry_valid))
        ev = np.asarray(a.entry_valid)
        np.testing.assert_array_equal(np.asarray(a.win_gidx)[ev],
                                      np.asarray(b.win_gidx)[ev])
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        assert ev.sum() > 50  # the scenes must actually exercise windows

    def test_render_identical(self):
        cam = front_camera()
        means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(7), 500)
        bg = jnp.array([0.2, 0.8, 0.1])
        a = rasterize_tiled(means, shs, op, scales, quats, cam, bg,
                            make_cfg(bin_mode="sort"))
        b = rasterize_tiled(means, shs, op, scales, quats, cam, bg,
                            make_cfg(bin_mode="count"))
        np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))
        np.testing.assert_array_equal(np.asarray(a.depth_expected),
                                      np.asarray(b.depth_expected))

    def test_gradients_identical(self):
        cam = front_camera()
        means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(9), 300)
        bg = jnp.zeros(3)

        def loss(mode, m, o):
            cfg = make_cfg(bin_mode=mode)
            out = rasterize_tiled(m, shs, o, scales, quats, cam, bg, cfg)
            return (out.image.sum() + out.alpha.sum()
                    + out.depth_expected.sum())

        ga = jax.grad(lambda m, o: loss("sort", m, o), argnums=(0, 1))(means, op)
        gb = jax.grad(lambda m, o: loss("count", m, o), argnums=(0, 1))(means, op)
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7)


def test_pack_mode_fused_matches_gather():
    """pack_mode="fused" (windows hold original surfel ids; no pack row
    gather) must reproduce pack_mode="gather" (legacy depth-order row
    gather) — identical forward outputs and matching gradients. The depth
    sort is stable in both modes, so the composite order is identical."""
    cam = front_camera()
    means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(3), 400)
    bg = jnp.array([0.2, 0.4, 0.6])

    def render(pack_mode, m, o):
        cfg = make_cfg(tile_budget=64, dup=2, visible_budget=256,
                       pack_mode=pack_mode)
        return rasterize_tiled(m, shs, o, scales, quats, cam, bg, cfg)

    a = render("gather", means, op)
    b = render("fused", means, op)
    for name, fa, fb in zip(a._fields, a, b):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   atol=1e-5, err_msg=name)

    def loss(pack_mode, m, o):
        out = render(pack_mode, m, o)
        return (out.image.sum() + out.alpha.sum() + out.distortion.sum()
                + out.depth_expected.sum() + out.normal.sum())

    ga = jax.grad(lambda m, o: loss("gather", m, o), argnums=(0, 1))(means, op)
    gb = jax.grad(lambda m, o: loss("fused", m, o), argnums=(0, 1))(means, op)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)
