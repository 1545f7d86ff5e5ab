"""Training loop (counterpart of train_lightning.py + lightning/system.py).

Schedule semantics mirrored from the reference:
  - `limit_train_batches` fraction of the loader per epoch (base.yaml:60),
    validation on `limit_val_batches` every epoch (train_lightning.py:78-80);
  - optimizer steps = micro-steps / grad_accum; `global_step` (used by the
    fine gate start_fine=5000 and the loss gates) counts optimizer steps;
  - checkpoint every `ckpt_every_n_epoch` epochs; full resume via
    `model.ckpt_path` (train_lightning.py:85-90);
  - scalars to tensorboardX; image panels every `vis_every_n_steps`.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from lara_tpu.config import Config
from lara_tpu.data import DataLoader, dataset_dict
from lara_tpu.models import LaRaNet
from lara_tpu.parallel.mesh import make_mesh, shard_batch
from lara_tpu.train import checkpoint as ckpt
from lara_tpu.train.state import TrainState, make_optimizer
from lara_tpu.train.step import make_eval_step, make_train_step


class _WandbWriter:
    """tensorboardX-shaped adapter over wandb (add_scalar/add_image), so the
    loop logs through one interface regardless of cfg.logger.name."""

    def __init__(self, cfg: Config, workdir: str):
        import os

        import wandb  # optional dependency

        os.environ.setdefault("WANDB__SERVICE_WAIT", "600")  # train_lightning.py:54
        self._run = wandb.init(project="LaRa", name=cfg.exp_name,
                               dir=workdir, config=dataclasses_to_dict(cfg))
        self._wandb = wandb

    def add_scalar(self, tag, value, step):
        self._run.log({tag: value}, step=int(step))

    def add_image(self, tag, img_chw, step):
        img = np.transpose(np.asarray(img_chw), (1, 2, 0))
        self._run.log({tag: self._wandb.Image(img)}, step=int(step))


def dataclasses_to_dict(obj):
    import dataclasses

    if dataclasses.is_dataclass(obj):
        return {f.name: dataclasses_to_dict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    return obj


class Trainer:
    def __init__(self, cfg: Config, workdir: Optional[str] = None):
        self.cfg = cfg
        self.workdir = workdir or cfg.logger.dir
        os.makedirs(self.workdir, exist_ok=True)
        from lara_tpu.parallel import tp
        from lara_tpu.parallel.distributed import maybe_initialize_distributed
        maybe_initialize_distributed()
        self.mesh = make_mesh(n_tp=cfg.train.tp)
        tp.enable(self.mesh)
        self.net = LaRaNet(cfg)
        self._writer = None
        self._preempted = False
        self._rv_rng = np.random.default_rng((cfg.train.seed, 17))
        self._install_preemption_handler()

    def _install_preemption_handler(self):
        """Checkpoint-on-SIGTERM (preemption safety; the reference has no
        recovery beyond manual restart — SURVEY.md §5.3)."""
        import signal

        def handler(signum, frame):
            self._preempted = True

        try:
            signal.signal(signal.SIGTERM, handler)
        except ValueError:
            pass  # not in the main thread (e.g. under a test runner)

    @property
    def writer(self):
        """Scalar/image logger selected by cfg.logger.name — 'tensorboard'
        (default) or 'wandb' (train_lightning.py:51-55, configs/base.yaml:
        68-70). W&B degrades to tensorboard when the package is missing."""
        if self._writer is None:
            if self.cfg.logger.name == "wandb":
                try:
                    self._writer = _WandbWriter(self.cfg, self.workdir)
                except Exception as e:
                    print(f"wandb unavailable ({e!r}); using tensorboard")
            if self._writer is None:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(self.workdir)
        return self._writer

    def _num_opt_steps(self, loader: DataLoader) -> int:
        """lightning/system.py:69-76: dataset batches × epochs ×
        limit_train_batches / grad_accum (devices already divided out by the
        global batch)."""
        t = self.cfg.train
        per_epoch = int(len(loader) * t.limit_train_batches)
        return max(1, per_epoch * t.n_epoch // t.grad_accum)

    def init_state(self, sample_batch: Dict, max_iters: int) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.train.seed)
        batch = {k: v for k, v in sample_batch.items() if k != "meta"}
        # jit the init: op-by-op eager init costs 20+ min through the
        # remote-dispatch tunnel vs seconds jitted
        init_fn = jax.jit(lambda r: self.net.init(r, batch, with_fine=True,
                                                  train=False))
        params = init_fn(rng)
        params = self._maybe_load_encoder(params)
        tx, _ = make_optimizer(self.cfg.train, max_iters)
        return TrainState.create(apply_fn=self.net.apply, params=params, tx=tx)

    def _maybe_load_encoder(self, params):
        """Load pretrained DINO encoder weights from a local timm state-dict
        file when configured (the reference downloads them from the hub,
        lightning/network.py:44; this container has no egress)."""
        path = self.cfg.model.encoder_pretrained_path
        if not path or not os.path.exists(path):
            return params
        import numpy as np

        from lara_tpu.models.vit import convert_timm_state_dict

        if path.endswith(".npz"):
            state = dict(np.load(path))
        else:
            import torch

            state = {k: v.numpy() for k, v in
                     torch.load(path, map_location="cpu").items()}
        converted = convert_timm_state_dict(state, depth=self.cfg.model.encoder_depth)
        params = dict(params)
        params["params"] = dict(params["params"])
        params["params"]["img_encoder"] = converted
        print(f"loaded pretrained encoder from {path}")
        return params

    def fit(self, max_steps: Optional[int] = None) -> Dict:
        cfg = self.cfg
        train_ds = dataset_dict[cfg.train_dataset.dataset_name](cfg.train_dataset)
        val_ds = dataset_dict[cfg.test_dataset.dataset_name](cfg.test_dataset)
        train_loader = DataLoader(train_ds, cfg.train_dataset.batch_size,
                                  shuffle=True, num_workers=cfg.train_dataset.num_workers,
                                  seed=cfg.train.seed)
        val_loader = DataLoader(val_ds, cfg.test_dataset.batch_size, shuffle=False,
                                num_workers=cfg.test_dataset.num_workers)

        sample = next(iter(DataLoader(train_ds, cfg.train_dataset.batch_size,
                                      num_workers=0)))
        max_iters = self._num_opt_steps(train_loader)
        state = self.init_state(sample, max_iters)
        from lara_tpu.parallel.mesh import replicate_state
        state = replicate_state(state, self.mesh)

        start_epoch = 0
        ckpt_dir = os.path.join(self.workdir, "ckpts")
        resume_from = cfg.model.ckpt_path or (
            ckpt_dir if ckpt.latest_step(ckpt_dir) is not None else None)
        if resume_from:
            template = {"params": state.params, "opt_state": state.opt_state,
                        "step": 0, "epoch": 0}
            restored = ckpt.restore_checkpoint(resume_from, template)
            state = state.replace(params=restored["params"],
                                  opt_state=restored["opt_state"],
                                  step=restored["step"])
            start_epoch = restored["epoch"] + 1

        # one compiled step per (fine, n_views_sel) combination — built
        # lazily; with use_rand_views off only (fine, None) variants exist
        step_cache: Dict = {}

        def get_step(with_fine: bool, n_sel):
            key = (with_fine, n_sel)
            if key not in step_cache:
                step_cache[key] = make_train_step(
                    self.net, self.mesh, with_fine=with_fine,
                    grad_accum=cfg.train.grad_accum, n_views_sel=n_sel)
            return step_cache[key]
        eval_coarse = make_eval_step(self.net, self.mesh, with_fine=False)
        eval_fine = make_eval_step(self.net, self.mesh, with_fine=True)

        t = cfg.train
        batches_per_epoch = max(1, int(len(train_loader) * t.limit_train_batches))
        micro = int(state.step)
        # Honest step telemetry: the first logging interval contains jit
        # compilation, so steps_per_sec is measured from the END of that
        # interval onward, and per-interval step times feed a p50 estimate.
        t_warm = None
        micro_warm = micro
        t_prev = None
        step_times: list = []
        last_stats: Dict = {}
        stop = False

        from lara_tpu.parallel.mesh import device_prefetch

        for epoch in range(start_epoch, t.n_epoch):
            train_loader.set_epoch(epoch)
            prefetched = device_prefetch(iter(train_loader), self.mesh)
            for i, (sb, _meta) in enumerate(prefetched):
                if i >= batches_per_epoch:
                    break
                global_step = micro // t.grad_accum
                batch = sb  # host copies only needed for vis panels
                sb = dict(sb)
                sb.pop("meta", None)
                n_sel = None
                if t.use_rand_views:
                    # random 2-4 input views per step (lightning/network.py:
                    # 434-438): static slice to the first n_sel views (the
                    # loader shuffles view order, so a prefix is a uniform
                    # random subset) — no encoder FLOPs on dropped views
                    n_sel = int(self._rv_rng.integers(
                        2, min(4, self.cfg.n_views) + 1))
                    if n_sel == self.cfg.n_views:
                        n_sel = None
                fn = get_step(global_step > t.start_fine, n_sel)
                state, stats = fn(state, sb)
                micro += 1
                if micro % (10 * t.grad_accum) == 0:
                    last_stats = {k: float(v) for k, v in stats.items()}
                    now = time.time()
                    if t_warm is None:
                        t_warm, micro_warm = now, micro  # interval 0 = compile
                    else:
                        last_stats["steps_per_sec"] = (
                            (micro - micro_warm) / (now - t_warm))
                        step_times.append((now - t_prev) / (10 * t.grad_accum))
                        last_stats["step_time_p50_s"] = float(
                            np.median(step_times))
                    t_prev = now
                    for k, v in last_stats.items():
                        self.writer.add_scalar(f"train/{k}", v, global_step)
                if t.vis_every_n_steps and global_step > 0 and \
                        micro % (t.vis_every_n_steps * t.grad_accum) == 0:
                    self._vis(state, batch, sb, global_step, "train")
                if self._preempted:
                    ckpt.save_checkpoint(ckpt_dir, int(state.step), state, epoch)
                    print(f"[preempt] checkpoint saved at step {int(state.step)}")
                    self.state = state
                    return last_stats
                if max_steps is not None and micro >= max_steps:
                    stop = True
                    break

            if stop:
                break  # max_steps reached — skip validation, exit the fit

            # validation (lightning/system.py:38-52) — runs at the end of
            # every check_val_every_n_epoch-th epoch (Lightning Trainer
            # semantics; default 1 = every epoch), including when the epoch
            # was truncated by limit_train_batches (the reference's
            # Lightning loop does too; round-1 conflated the two inner
            # breaks and never got here). Deliberate divergence from
            # Lightning: the FINAL epoch always validates so the run ends
            # with fresh metrics even when n_epoch is not a multiple of
            # check_val_every_n_epoch.
            if ((epoch + 1) % max(1, t.check_val_every_n_epoch) != 0
                    and epoch != t.n_epoch - 1):
                if t.ckpt_every_n_epoch and (epoch + 1) % t.ckpt_every_n_epoch == 0:
                    ckpt.save_checkpoint(ckpt_dir, int(state.step), state, epoch)
                continue
            val_batches = max(1, int(len(val_loader) * t.limit_val_batches))
            agg: Dict[str, list] = {}
            for j, batch in enumerate(val_loader):
                if j >= val_batches:
                    break
                sb = shard_batch(batch, self.mesh)
                sb.pop("meta", None)
                global_step = micro // t.grad_accum
                efn = eval_fine if global_step > t.start_fine else eval_coarse
                out, stats = efn(state.params, sb, global_step)
                if j == 0:
                    self._log_panels(out, batch, global_step, "val")
                for k, v in stats.items():
                    agg.setdefault(k, []).append(float(v))
            for k, vs in agg.items():
                self.writer.add_scalar(f"val/{k}", float(np.mean(vs)), epoch)

            if (t.ckpt_every_n_epoch and (epoch + 1) % t.ckpt_every_n_epoch == 0) \
                    or epoch == t.n_epoch - 1:
                ckpt.save_checkpoint(ckpt_dir, int(state.step), state, epoch)

        self.state = state
        return last_stats

    def _vis(self, state, batch, sharded_batch, step: int, prefix: str):
        """Render image panels with the current params (lightning/system.py:
        33-34,57-67: every 3000 steps, rank-0 only — here: host 0)."""
        if jax.process_index() != 0:
            return
        from lara_tpu.train.step import make_eval_step

        with_fine = step > self.cfg.train.start_fine
        # cache the jitted eval fns: a fresh make_eval_step each call would
        # recompile every vis invocation
        if not hasattr(self, "_vis_fns"):
            self._vis_fns = {}
        if with_fine not in self._vis_fns:
            self._vis_fns[with_fine] = make_eval_step(self.net, self.mesh,
                                                      with_fine=with_fine)
        out, _ = self._vis_fns[with_fine](state.params, sharded_batch, step)
        self._log_panels(out, batch, step, prefix)

    def _log_panels(self, out, batch, step: int, prefix: str):
        import numpy as np

        from lara_tpu.eval.vis import vis_images

        host_out = {k: np.asarray(v) for k, v in out.items()
                    if hasattr(v, "shape")}
        panels = vis_images(host_out, batch)
        for key, value in panels.items():
            b, h, w = value.shape[:3]
            img = value.reshape(b * h, w, 3).transpose(2, 0, 1)
            self.writer.add_image(f"{prefix}/{key}", np.clip(img, 0, 1), step)
