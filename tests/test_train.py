"""Training system: optimizer masks, schedule, sharded train step, mini
end-to-end convergence on the synthetic dataset (SURVEY.md §4 items (d)/(e))."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lara_tpu.config import DatasetConfig
from lara_tpu.data import DataLoader, SyntheticDataset
from lara_tpu.models import LaRaNet
from lara_tpu.parallel.mesh import make_mesh, shard_batch
from lara_tpu.train.state import TrainState, cosine_warmup_schedule, decay_mask, make_optimizer
from lara_tpu.train.step import make_train_step
from tests.test_model import synthetic_batch, tiny_config


def test_decay_mask_structure():
    params = {"params": {
        "dense": {"kernel": np.zeros((2, 2)), "bias": np.zeros(2)},
        "norm": {"scale": np.ones(2), "bias": np.zeros(2)},
        "pos_embed": np.zeros((1, 4)),
    }}
    mask = decay_mask(params)
    assert mask["params"]["dense"]["kernel"] is True
    assert mask["params"]["dense"]["bias"] is False
    assert mask["params"]["norm"]["scale"] is False
    assert mask["params"]["norm"]["bias"] is False
    assert mask["params"]["pos_embed"] is True


def test_cosine_warmup_schedule():
    s = cosine_warmup_schedule(1e-3, warmup_iters=100, max_iters=1000)
    assert float(s(0)) < 1e-4
    assert abs(float(s(100)) - 1e-3) < 1e-6
    assert abs(float(s(550)) - 1e-3 * 0.5 * (1 + np.cos(np.pi * 0.5))) < 1e-5
    assert float(s(1000)) < 1e-6
    # monotone decay after warmup
    assert float(s(300)) > float(s(600)) > float(s(900))


def test_multisteps_accumulation():
    import optax
    from lara_tpu.config import TrainConfig

    tx, _ = make_optimizer(TrainConfig(grad_accum=2, warmup_iters=1, lr=1e-2), 100)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    updates, state = tx.update(g, state, params)
    # first micro-step: no parameter change yet
    assert float(jnp.abs(updates["w"]).max()) == 0.0
    updates, state = tx.update(g, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0.0


def test_sharded_train_step_runs_and_improves():
    cfg = tiny_config()
    net = LaRaNet(cfg)
    batch = synthetic_batch(B=8, n_views=2, H=64, W=64)  # dp=8 mesh → 1 scene/device
    mesh = make_mesh()
    assert mesh.devices.size == 8

    params = net.init(jax.random.PRNGKey(0), batch, with_fine=True, train=False)
    from lara_tpu.config import TrainConfig
    tx, _ = make_optimizer(TrainConfig(grad_accum=1, warmup_iters=2, lr=2e-3), 200)
    state = TrainState.create(apply_fn=net.apply, params=params, tx=tx)

    step = make_train_step(net, mesh, with_fine=False)
    sb = shard_batch(batch, mesh)
    losses = []
    for _ in range(8):
        state, stats = step(state, sb)
        losses.append(float(stats["loss"]))
    assert np.all(np.isfinite(losses))
    # overfitting a single batch must reduce the loss
    assert losses[-1] < losses[0]


def test_synthetic_dataset_schema(tmp_path):
    ds_cfg = DatasetConfig(dataset_name="synthetic",
                           data_root=str(tmp_path / "syn.h5"),
                           split="train", img_size=(64, 64), n_group=2,
                           batch_size=2, num_workers=2)
    ds = SyntheticDataset(ds_cfg)
    sample = ds[0]
    N = 4  # 2 inputs + 2 supervision
    assert sample["tar_rgb"].shape == (N, 64, 64, 3)
    assert sample["tar_c2w"].shape == (N, 4, 4)
    assert sample["tar_rays"].shape == (N, 64, 64, 6)
    assert sample["tar_rays_down"].shape == (N, 4, 4, 6)
    assert sample["near_far"].shape == (2,)
    # first camera canonicalized onto -z
    np.testing.assert_allclose(sample["tar_c2w"][0, :3, :3], np.eye(3), atol=1e-5)
    assert sample["tar_c2w"][0, 2, 3] < 0

    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    b = batches[0]
    assert b["tar_rgb"].shape == (2, N, 64, 64, 3)
    assert b["fovx"].shape == (2,)

    # deterministic scene order given epoch (augmentation rng is stateful,
    # like the reference's global `random`)
    loader.set_epoch(0)
    s1 = [m["scene"] for m in next(iter(loader))["meta"]]
    loader.set_epoch(0)
    s2 = [m["scene"] for m in next(iter(loader))["meta"]]
    assert s1 == s2
    loader.set_epoch(1)
    s3 = [b["meta"][0]["scene"] for b in loader]
    loader.set_epoch(0)
    s4 = [b["meta"][0]["scene"] for b in loader]
    assert s3 != s4


def test_device_prefetch_order_and_sharding():
    from lara_tpu.parallel.mesh import device_prefetch, make_mesh

    mesh = make_mesh()
    batches = [{"x": np.full((8, 2), i, np.float32), "meta": [i]} for i in range(5)]
    out = list(device_prefetch(iter(batches), mesh, size=2))
    assert len(out) == 5
    for i, (sb, meta) in enumerate(out):
        assert meta == [i]
        assert float(sb["x"][0, 0]) == i
        # leading axis sharded over the dp mesh axis
        assert len(sb["x"].sharding.device_set) == 8
