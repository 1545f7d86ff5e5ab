import os

from lara_tpu.config import load_config


def test_load_merge_interp_overrides(tmp_path):
    base = os.path.join(os.path.dirname(__file__), "..", "configs", "base.yaml")
    extra = tmp_path / "extra.yaml"
    extra.write_text("n_views: 3\ntrain:\n    lr: 1.0e-3\n")
    cfg = load_config(base, str(extra), overrides=["train.batch_size=7",
                                                   "model.K=4",
                                                   "exp_name=foo/bar"])
    assert cfg.n_views == 3
    # ${n_views} interpolation into the dataset config
    assert cfg.train_dataset.n_group == 3
    assert cfg.train.lr == 1e-3
    assert cfg.train.batch_size == 7
    assert cfg.model.K == 4
    # embedded string interpolation
    assert cfg.logger.dir == "logs/foo/bar"
    # untouched defaults survive the merges
    assert cfg.train.grad_clip == 0.5
    assert cfg.model.n_groups == (16,)


def test_base_matches_reference_hyperparams():
    base = os.path.join(os.path.dirname(__file__), "..", "configs", "base.yaml")
    cfg = load_config(base)
    # the reference's training recipe (configs/base.yaml:51-64)
    assert cfg.train.lr == 4e-4
    assert (cfg.train.beta1, cfg.train.beta2) == (0.9, 0.95)
    assert cfg.train.weight_decay == 0.05
    assert cfg.train.warmup_iters == 1000
    assert cfg.train.n_epoch == 30
    assert cfg.train.start_fine == 5000
    assert cfg.model.vol_embedding_reso == 32
    assert cfg.model.sh_degree == 1
