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
