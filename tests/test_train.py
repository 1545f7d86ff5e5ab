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


def test_loss_gate_counts_optimizer_steps():
    """The >1000 loss gate counts optimizer steps (Lightning global_step,
    lightning/loss.py:49), not micro-steps: with grad_accum=2, micro-step
    2000 is optimizer step 1000 → gate still closed; 2002 → 1001 → open."""
    from lara_tpu.config import TrainConfig

    cfg = tiny_config()
    net = LaRaNet(cfg)
    batch = synthetic_batch(B=8, n_views=2, H=64, W=64)
    mesh = make_mesh()
    params = net.init(jax.random.PRNGKey(0), batch, with_fine=False, train=False)
    tx, _ = make_optimizer(TrainConfig(grad_accum=2, warmup_iters=1), 4000)
    step = make_train_step(net, mesh, with_fine=False, grad_accum=2)
    sb = shard_batch(batch, mesh)

    def fresh_state(at_step):
        # the train step donates its input state, so build one per call
        s = TrainState.create(apply_fn=net.apply,
                              params=jax.tree.map(jnp.copy, params), tx=tx)
        return s.replace(step=at_step)

    _, s_closed = step(fresh_state(2000), dict(sb))
    _, s_open = step(fresh_state(2002), dict(sb))
    gap = 1000.0 * float(s_open["distortion"]) + 0.2 * float(s_open["normal"])
    assert gap > 0.0
    assert abs((float(s_open["loss"]) - float(s_closed["loss"])) - gap) < 1e-4


def test_dp8_matches_dp1_loss_and_update():
    """DDP equivalence (train_lightning.py:68-72 semantics): the same global
    batch through a dp=8 mesh and a dp=1 mesh must give the same loss and the
    same parameter update (grad all-reduce ≡ single-device mean)."""
    from lara_tpu.config import TrainConfig

    cfg = tiny_config()
    net = LaRaNet(cfg)
    batch = synthetic_batch(B=8, n_views=2, H=64, W=64, seed=3)
    params = net.init(jax.random.PRNGKey(1), batch, with_fine=False, train=False)

    results = {}
    for n_dp in (8, 1):
        mesh = make_mesh(n_dp=n_dp, devices=jax.devices()[:n_dp])
        tx, _ = make_optimizer(TrainConfig(grad_accum=1, warmup_iters=2, lr=1e-3), 100)
        state = TrainState.create(apply_fn=net.apply,
                                  params=jax.tree.map(jnp.copy, params), tx=tx)
        step = make_train_step(net, mesh, with_fine=False, grad_accum=1)
        new_state, stats = step(state, shard_batch(batch, mesh))
        results[n_dp] = (float(stats["loss"]), new_state.params)

    loss8, p8 = results[8]
    loss1, p1 = results[1]
    # bf16 model compute + different reduction order (psum of per-device
    # means vs one 8-batch mean) bounds the agreement at ~1e-4 relative
    assert abs(loss8 - loss1) < 5e-4 * max(1.0, abs(loss1))
    for l8, l1 in zip(jax.tree.leaves(p8), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(l8), np.asarray(l1),
                                   rtol=2e-4, atol=1e-5)


def test_fit_truncated_epoch_still_validates_and_checkpoints(tmp_path):
    """Regression for the round-1 bug where the inner `i >= batches_per_epoch`
    break fell through a for/else to the outer `break`, silently ending
    training after ~20% of epoch 0 with no validation or checkpoint."""
    import dataclasses as dc

    from lara_tpu.config import LoggerConfig, TrainConfig
    from lara_tpu.train import checkpoint as ckpt
    from lara_tpu.train.loop import Trainer

    ds = DatasetConfig(dataset_name="synthetic",
                       data_root=str(tmp_path / "syn.h5"), split="train",
                       img_size=(64, 64), n_group=2, n_scenes=64,
                       batch_size=8, num_workers=0)
    # val reuses the train split: the synthetic shard's test split (7 of 64
    # scenes) is smaller than one dp=8 batch
    cfg = dc.replace(
        tiny_config(),
        train_dataset=ds,
        test_dataset=ds,
        train=TrainConfig(n_epoch=2, limit_train_batches=0.15,
                          limit_val_batches=0.05, grad_accum=1,
                          start_fine=10 ** 9, ckpt_every_n_epoch=1,
                          vis_every_n_steps=0, warmup_iters=2),
        logger=LoggerConfig(dir=str(tmp_path / "logs")),
    )
    tr = Trainer(cfg)
    tr.fit()
    # 57 train scenes → 7 batches/epoch → limit 0.15 → 1 micro-step per
    # epoch × 2 epochs; with the old bug training stopped inside epoch 0
    # and never checkpointed.
    assert int(tr.state.step) == 2
    assert ckpt.latest_step(str(tmp_path / "logs" / "ckpts")) is not None


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


def test_distributed_init_guard():
    """maybe_initialize_distributed must be a no-op on a single host: no
    explicit coordinator / worker-count>1 env, or a JAX backend already
    live (then initialize() would hard-fail — the reference counterpart is
    Lightning bringing up DDP before any CUDA use, train_lightning.py:68)."""
    import os
    from unittest import mock

    import jax

    from lara_tpu.parallel.distributed import maybe_initialize_distributed

    # single-host: nothing multi-process in the env
    clean = {k: v for k, v in os.environ.items()
             if k not in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                          "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES",
                          "MEGASCALE_COORDINATOR_ADDRESS")}
    with mock.patch.dict(os.environ, clean, clear=True):
        assert maybe_initialize_distributed() is False

    # single-entry hostname list is still single-host
    with mock.patch.dict(os.environ, {**clean, "TPU_WORKER_HOSTNAMES": "vm0"},
                         clear=True):
        assert maybe_initialize_distributed() is False

    # multi-process env but a backend is already initialized (true in this
    # test process) -> refuse rather than crash
    jax.devices()
    with mock.patch.dict(
            os.environ,
            {**clean, "JAX_COORDINATOR_ADDRESS": "127.0.0.1:1234",
             "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": "0"},
            clear=True):
        assert maybe_initialize_distributed() is False


def test_restore_migrates_pre_scan_checkpoint_layout(tmp_path):
    """Checkpoints written before the scanned-stack refactor store the ViT /
    volume layers unrolled (img_encoder.block{i}, vol_decoder.layer{i});
    restore must stack them into the nn.scan layout (blocks.block /
    layers.block) for both full resume and weight-only eval restore."""
    import types

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lara_tpu.config import TrainConfig
    from lara_tpu.models import LaRaNet
    from lara_tpu.train import checkpoint as ckpt
    from lara_tpu.train.state import make_optimizer
    from tests.test_model import synthetic_batch, tiny_config

    net = LaRaNet(tiny_config())
    batch = synthetic_batch(B=1, n_views=2, H=64, W=64)
    params = net.init(jax.random.PRNGKey(0), batch, with_fine=True, train=False)
    tx, _ = make_optimizer(TrainConfig(grad_accum=1, warmup_iters=2), 10)
    opt_state = tx.init(params)

    def unstack(node):
        """New scanned layout -> the old unrolled layout (test-side inverse
        of checkpoint.migrate_unrolled_layout)."""
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in ("blocks", "layers") and isinstance(v, dict) \
                        and set(v) == {"block"}:
                    depth = jax.tree.leaves(v)[0].shape[0]
                    prefix = "block" if k == "blocks" else "layer"
                    for i in range(depth):
                        out[f"{prefix}{i}"] = jax.tree.map(
                            lambda x, i=i: x[i], v["block"])
                else:
                    out[k] = unstack(v)
            return out
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(unstack(c) for c in node))
        if isinstance(node, (tuple, list)):
            return type(node)(unstack(c) for c in node)
        return node

    old_state = types.SimpleNamespace(
        params=unstack(params), opt_state=unstack(opt_state), step=3)
    assert "block0" in old_state.params["params"]["img_encoder"]
    ckpt.save_checkpoint(str(tmp_path), 3, old_state, epoch=1)

    template = {"params": jax.tree.map(jnp.zeros_like, params),
                "opt_state": jax.tree.map(jnp.zeros_like, opt_state),
                "step": 0, "epoch": 0}
    restored = ckpt.restore_checkpoint(str(tmp_path), template)
    assert restored["epoch"] == 1
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    loaded = ckpt.restore_params(str(tmp_path))
    assert jax.tree.structure(loaded) == jax.tree.structure(params)
