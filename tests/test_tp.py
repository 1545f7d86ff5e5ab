"""Tensor parallelism over the volume-transformer group axis (SURVEY.md
§5.7/§5.8): a dp=2 × tp=4 mesh must produce the same loss/updates as pure
dp on the same global batch — the TP sharding constraints change layout,
never math."""

import jax
import jax.numpy as jnp
import numpy as np

from lara_tpu.models import LaRaNet
from lara_tpu.parallel import tp
from lara_tpu.parallel.mesh import make_mesh, shard_batch
from lara_tpu.train.state import TrainState, make_optimizer
from lara_tpu.train.step import make_train_step
from tests.test_model import synthetic_batch, tiny_config


def _loss_after_step(mesh, net, batch, params, with_tp):
    from lara_tpu.config import TrainConfig

    tp.enable(mesh if with_tp else None)
    try:
        tx, _ = make_optimizer(TrainConfig(grad_accum=1, warmup_iters=2), 100)
        state = TrainState.create(
            apply_fn=net.apply, params=jax.tree.map(jnp.copy, params), tx=tx)
        step = make_train_step(net, mesh, with_fine=True, grad_accum=1)
        sb = shard_batch(batch, mesh)
        sb.pop("meta", None)
        state, stats = step(state, sb)
        # a second step exercises updated (possibly resharded) params
        state, stats2 = step(state, dict(sb))
        return float(stats["loss"]), float(stats2["loss"])
    finally:
        tp.enable(None)


def test_tp_matches_dp_loss():
    cfg = tiny_config()
    net = LaRaNet(cfg)
    batch = synthetic_batch(B=2, n_views=2, H=64, W=64)
    params = net.init(jax.random.PRNGKey(0), batch, with_fine=True, train=False)

    mesh_dp = make_mesh(n_dp=2, devices=jax.devices()[:2])
    l_dp = _loss_after_step(mesh_dp, net, batch, params, with_tp=False)

    mesh_tp = make_mesh(n_dp=2, n_tp=4)
    assert mesh_tp.shape == {"dp": 2, "tp": 4}
    l_tp = _loss_after_step(mesh_tp, net, batch, params, with_tp=True)

    np.testing.assert_allclose(l_tp, l_dp, rtol=2e-5, atol=2e-5)
    assert np.isfinite(l_tp).all()


def test_tp_sharded_render_matches_dp_loss():
    """dp=2 x tp=2 with N=2 target views: each tp rank renders ONE view per
    scene through tp.shard_map_render (N % tp == 0, unlike the tp=4 case
    above which exercises the fallback). Loss must match pure dp — the
    view split plus the shard_map-transpose psum of the surfel gradients
    is a layout change, never math."""
    cfg = tiny_config()
    net = LaRaNet(cfg)
    batch = synthetic_batch(B=2, n_views=2, H=64, W=64)
    params = net.init(jax.random.PRNGKey(0), batch, with_fine=True, train=False)

    mesh_dp = make_mesh(n_dp=2, devices=jax.devices()[:2])
    l_dp = _loss_after_step(mesh_dp, net, batch, params, with_tp=False)

    mesh_tp = make_mesh(n_dp=2, n_tp=2)
    assert mesh_tp.shape == {"dp": 2, "tp": 2}
    l_tp = _loss_after_step(mesh_tp, net, batch, params, with_tp=True)

    np.testing.assert_allclose(l_tp, l_dp, rtol=2e-5, atol=2e-5)
    assert np.isfinite(l_tp).all()


def test_tp_fallback_warns_loudly():
    """N views not divisible by tp must warn (once) instead of silently
    rendering unsharded on every rank — VERDICT r3 weak #7."""
    import warnings

    import pytest

    mesh = make_mesh(n_dp=2, n_tp=4)
    tp.enable(mesh)
    try:
        tp._WARNED_FALLBACK = False
        views = {"x": jnp.zeros((2, 3, 4))}   # 3 views, tp=4 → fallback
        scenes = {"y": jnp.zeros((2, 4))}
        with pytest.warns(RuntimeWarning, match="not divisible by tp"):
            out = tp.shard_map_render(lambda v, s: v, views, scenes)
        np.testing.assert_array_equal(out["x"], views["x"])
        # second call: warned once already, stays quiet
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            tp.shard_map_render(lambda v, s: v, views, scenes)
    finally:
        tp.enable(None)
        tp._WARNED_FALLBACK = False


def test_tp2_flagship_shape_lowers():
    """AOT-lower the FULL fine train step at the flagship model dims
    (ViT-B/16 encoder, 12-layer volume transformer, 64³×K surfels) on a
    dp=1 × tp=2 CPU mesh — a real pod run must not be the first place the
    tp sharding of the render loop / group axis meets the flagship graph
    (VERDICT r3 item 9). Lowering traces the whole step and resolves every
    sharding constraint; backend codegen is skipped to keep the test
    CPU-affordable."""
    from lara_tpu.config import Config, TrainConfig

    cfg = Config(n_views=4)    # flagship dims; 256² keeps host constants small
    net = LaRaNet(cfg)
    batch = synthetic_batch(B=1, n_views=cfg.n_views, H=256, W=256)
    params_shape = jax.eval_shape(
        lambda r: net.init(r, batch, with_fine=True, train=False),
        jax.random.PRNGKey(0))

    mesh = make_mesh(n_dp=1, n_tp=2, devices=jax.devices()[:2])
    tp.enable(mesh)
    try:
        tx, _ = make_optimizer(TrainConfig(grad_accum=1, warmup_iters=2), 100)
        state_shape = jax.eval_shape(
            lambda p: TrainState.create(apply_fn=net.apply, params=p, tx=tx),
            params_shape)
        step = make_train_step(net, mesh, with_fine=True, grad_accum=1)
        sb = shard_batch(batch, mesh)
        sb.pop("meta", None)
        lowered = step.lower(state_shape, sb)   # step is already jitted
        text = lowered.as_text()
        assert "shard_map" in text or "sharding" in text
    finally:
        tp.enable(None)


def test_tp_disabled_emits_no_constraints():
    """With TP disabled the model must trace with zero sharding
    constraints — the axon single-chip backend pays 100x for them."""
    cfg = tiny_config()
    net = LaRaNet(cfg)
    batch = synthetic_batch(B=1, n_views=2, H=64, W=64)
    params = net.init(jax.random.PRNGKey(0), batch, with_fine=False, train=False)
    tp.enable(None)
    jaxpr = jax.make_jaxpr(
        lambda p, b: net.apply(p, b, with_fine=False, train=False)["image"]
    )(params, batch)
    assert "sharding_constraint" not in str(jaxpr)
