"""Pallas blend kernel vs tiled backend equivalence (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lara_tpu.ops.rasterizer.tiled import rasterize_tiled
from tests.test_rasterizer import dc_shs, front_camera, make_cfg, random_scene


def _pallas_interpret(monkeypatch_call=None):
    """Run the pallas backend with the kernel in interpreter mode (no TPU)."""
    import lara_tpu.ops.rasterizer.pallas_blend as pb

    orig = pb.pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    return pb, orig, patched


def test_pallas_matches_tiled_random_scene(monkeypatch):
    pb, orig, patched = _pallas_interpret()
    monkeypatch.setattr(pb.pl, "pallas_call", patched)
    from lara_tpu.ops.rasterizer.pallas import rasterize_pallas

    cfg = make_cfg(tile_budget=64, dup=2)
    cam = front_camera()
    means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(5), 300)
    bg = jnp.array([0.2, 0.5, 0.8])

    ref = rasterize_tiled(means, shs, op, scales, quats, cam, bg, cfg)
    pal = rasterize_pallas(means, shs, op, scales, quats, cam, bg, cfg)

    np.testing.assert_allclose(np.asarray(pal.image), np.asarray(ref.image), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pal.alpha), np.asarray(ref.alpha), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pal.depth_expected),
                               np.asarray(ref.depth_expected), atol=1e-3)
    np.testing.assert_allclose(np.asarray(pal.depth_median),
                               np.asarray(ref.depth_median), atol=1e-3)
    np.testing.assert_allclose(np.asarray(pal.normal), np.asarray(ref.normal), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pal.distortion),
                               np.asarray(ref.distortion), atol=2e-4)


def test_pallas_early_termination_semantics(monkeypatch):
    """An opaque stack: early exit must not change the composited result."""
    pb, orig, patched = _pallas_interpret()
    monkeypatch.setattr(pb.pl, "pallas_call", patched)
    from lara_tpu.ops.rasterizer.pallas import rasterize_pallas

    cfg = make_cfg(tile_budget=64, dup=2)
    cam = front_camera()
    n = 48
    z = jnp.linspace(-0.3, 0.3, n)
    means = jnp.stack([jnp.zeros(n), jnp.zeros(n), z], -1)
    shs = dc_shs([0.9, 0.4, 0.1], n)
    op = jnp.full((n,), 0.97)
    scales = jnp.full((n, 2), 0.06)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    bg = jnp.zeros(3)

    ref = rasterize_tiled(means, shs, op, scales, quats, cam, bg, cfg)
    pal = rasterize_pallas(means, shs, op, scales, quats, cam, bg, cfg)
    np.testing.assert_allclose(np.asarray(pal.image), np.asarray(ref.image), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pal.depth_median),
                               np.asarray(ref.depth_median), atol=1e-3)


def test_pallas_gradients_match_tiled(monkeypatch):
    """Custom-VJP Pallas backward vs XLA autodiff of the tiled backend."""
    pb, orig, patched = _pallas_interpret()
    monkeypatch.setattr(pb.pl, "pallas_call", patched)
    from lara_tpu.ops.rasterizer.pallas import rasterize_pallas

    cfg = make_cfg(tile_budget=64, dup=2)
    cam = front_camera()
    means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(9), 120)
    op_raw = jnp.clip(jax.random.normal(jax.random.PRNGKey(10), (120,)), -1, 1)
    sc_raw = jnp.log(scales)
    bg = jnp.full((3,), 0.3)
    tgt = jax.random.uniform(jax.random.PRNGKey(11), (64, 64, 3))

    def loss(render_fn, params):
        m, s, o, sc, q = params
        out = render_fn(m, s, jax.nn.sigmoid(o), jnp.exp(sc), q, cam, bg, cfg)
        return (jnp.mean((out.image - tgt) ** 2)
                + 0.05 * jnp.mean(out.distortion)
                + 0.02 * jnp.mean(out.normal)
                + 0.01 * jnp.mean(out.depth_expected)
                + 0.01 * jnp.mean(out.alpha))

    params = (means, shs, op_raw, sc_raw, quats)
    g_til = jax.grad(lambda p: loss(rasterize_tiled, p))(params)
    g_pal = jax.grad(lambda p: loss(rasterize_pallas, p))(params)
    for a, b, name in zip(g_til, g_pal, ["means", "shs", "op", "scales", "quats"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("chunk,tpg,cumsum", [
    (32, 1, "dot"), (64, 2, "dot"), (64, 4, "dot"),
    (32, 1, "shift"), (64, 4, "shift"),
    (32, 1, "prod"), (64, 4, "prod")])
def test_pallas_kernel_knobs_equivalence(monkeypatch, chunk, tpg, cumsum):
    """pallas_chunk / pallas_tiles_per_step / pallas_cumsum must not change
    values or grads (shift mode reassociates additions — tolerance-level)."""
    pb, orig, patched = _pallas_interpret()
    monkeypatch.setattr(pb.pl, "pallas_call", patched)
    from lara_tpu.ops.rasterizer.pallas import rasterize_pallas

    cfg = make_cfg(tile_budget=64, dup=2, backend="pallas",
                   pallas_chunk=chunk, pallas_tiles_per_step=tpg,
                   pallas_cumsum=cumsum, visible_budget=256)
    cam = front_camera()
    means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(7), 150)
    bg = jnp.array([0.3, 0.3, 0.3])

    ref = rasterize_tiled(means, shs, op, scales, quats, cam, bg,
                          make_cfg(tile_budget=64, dup=2, visible_budget=256))
    pal = rasterize_pallas(means, shs, op, scales, quats, cam, bg, cfg)
    np.testing.assert_allclose(np.asarray(pal.image), np.asarray(ref.image),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(pal.distortion),
                               np.asarray(ref.distortion), atol=2e-4)

    def loss(render_fn, rcfg, m):
        out = render_fn(m, shs, op, scales, quats, cam, bg, rcfg)
        return jnp.mean(out.image ** 2) + 0.1 * jnp.mean(out.distortion)

    g_t = jax.grad(lambda m: loss(
        rasterize_tiled, make_cfg(tile_budget=64, dup=2, visible_budget=256), m))(means)
    g_p = jax.grad(lambda m: loss(rasterize_pallas, cfg, m))(means)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_t),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("budget", [64, 16])
def test_stash_carries_matches_replay(monkeypatch, budget):
    """pallas_stash_carries=True (replay-free backward from forward-stashed
    chunk carries) must reproduce the replaying backward exactly — outputs
    AND gradients: stashed carries are bitwise the replayed ones."""
    pb, orig, patched = _pallas_interpret()
    monkeypatch.setattr(pb.pl, "pallas_call", patched)
    from lara_tpu.ops.rasterizer.pallas import rasterize_pallas

    cam = front_camera()
    means, shs, op, scales, quats = random_scene(jax.random.PRNGKey(11), 300)
    bg = jnp.array([0.6, 0.3, 0.1])

    def run(stash, m, o):
        cfg = make_cfg(tile_budget=budget, dup=2, backend="pallas",
                       pallas_chunk=min(32, budget),
                       pallas_stash_carries=stash)
        out = rasterize_pallas(m, shs, o, scales, quats, cam, bg, cfg)
        return out

    a = run(False, means, op)
    b = run(True, means, op)
    for name, fa, fb in zip(a._fields, a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))

    def loss(stash, m, o):
        out = run(stash, m, o)
        return (out.image.sum() + out.alpha.sum() + out.distortion.sum()
                + out.depth_expected.sum() + out.normal.sum())

    ga = jax.grad(lambda m, o: loss(False, m, o), argnums=(0, 1))(means, op)
    gb = jax.grad(lambda m, o: loss(True, m, o), argnums=(0, 1))(means, op)
    for x, y in zip(ga, gb):
        # the two backward graphs fuse/reassociate FMAs differently —
        # tolerance instead of bitwise equality (values above ARE bitwise)
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)
