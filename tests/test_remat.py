"""remat_views_save: compact rasterizer residuals kept across the per-view
render checkpoint (models/remat.py:views_remat_policy).

Verifies (a) gradients are bit-identical to the save-nothing remat — the
policy only changes WHAT is recomputed, never the math — and (b) the
backward really skips the binning re-sort (fewer sort ops in the compiled
fwd+bwd module)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lara_tpu.models import LaRaNet
from tests.test_model import synthetic_batch, tiny_config


def _build(save: str):
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, remat_views=True,
                                       remat_views_save=save))
    net = LaRaNet(cfg)
    batch = synthetic_batch(B=1, n_views=cfg.n_views, H=64, W=64)
    params = jax.jit(lambda r: net.init(r, batch, with_fine=True,
                                        train=True))(jax.random.PRNGKey(0))

    def loss(p):
        out = net.apply(p, batch, with_fine=True, train=True)
        return (jnp.mean(out["image"]) + jnp.mean(out["image_fine"])
                + jnp.mean(out["rend_dist"]))

    return loss, params


def test_remat_save_grad_parity():
    loss0, params = _build("")
    loss1, _ = _build("bin,packed,entries,stash")
    l0, g0 = jax.jit(jax.value_and_grad(loss0))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss1))(params)
    assert np.isclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_remat_save_skips_resort():
    def sort_count(save):
        loss, params = _build(save)
        txt = jax.jit(jax.grad(loss)).lower(params).compile().as_text()
        return txt.count("sort(")

    assert sort_count("bin,packed,entries,stash") < sort_count("")
