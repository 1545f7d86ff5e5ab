"""Component-level profile of the full fine train step at B=3, 512².

Splits the ~seconds step into components — encoder, coarse/fine forwards,
loss heads, full steps — so model-side work (ViT, volume transformer, top_k
fine selection, grid samples) is separated from the 48 rasterizer
invocations. Run on the real chip.

Each row runs in its OWN SUBPROCESS by default: at fine_budget 131072 the
decomposition graphs exceed HBM when several live executables coexist
(VERDICT r2 weak #6) — process isolation frees everything between rows and
the persistent compile cache keeps reruns fast.

Usage:
    python tools/profile_train_step.py            # all rows, subprocess each
    python tools/profile_train_step.py --row "FULL fine step"
    python tools/profile_train_step.py --trace /tmp/lara_trace
                                     # jax.profiler trace of the fine step
"""

import argparse
import subprocess
import sys
import time

sys.path.insert(0, ".")

ROWS = [
    "encoder fwd (12 imgs 512^2)",
    "coarse fwd (24 renders)",
    "fine fwd (48 renders)",
    "fine fwd + loss (no grad)",
    "coarse fwd+bwd (MSE only)",
    "FULL coarse step",
    "FULL fine step",
]


def slope_time(fn, args, r1, r2, fetch):
    out = fn(*args)
    fetch(out)

    def run(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(*args)
        fetch(o)
        return time.perf_counter() - t0

    a, b = run(r1), run(r2)
    return max((b - a) / (r2 - r1), 1e-9)


def build_row(row):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lara_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lara_tpu.config import Config, TrainConfig
    from lara_tpu.models import LaRaNet
    from lara_tpu.parallel.mesh import make_mesh, shard_batch
    from lara_tpu.train.loss import compute_losses
    from lara_tpu.train.state import TrainState, make_optimizer
    from lara_tpu.train.step import make_train_step
    from tests.test_model import synthetic_batch

    cfg = Config(n_views=4)
    # honor the same A/B lever envs as bench.py (LARA_FLASH=1 etc.)
    import dataclasses
    import os
    m = cfg.model
    if os.environ.get("LARA_FLASH", "") == "1":
        m = dataclasses.replace(m, flash_attn=True)
    if os.environ.get("LARA_REMAT_POLICY", ""):
        m = dataclasses.replace(m, remat_policy=os.environ["LARA_REMAT_POLICY"])
    if os.environ.get("LARA_REMAT_SAVE") is not None:
        m = dataclasses.replace(
            m, remat_views_save=os.environ["LARA_REMAT_SAVE"])
    r = cfg.render
    if os.environ.get("LARA_BIN_MODE", ""):
        r = dataclasses.replace(r, bin_mode=os.environ["LARA_BIN_MODE"])
    if os.environ.get("LARA_STASH", "") == "1":
        r = dataclasses.replace(r, pallas_stash_carries=True)
    if m is not cfg.model or r is not cfg.render:
        cfg = dataclasses.replace(cfg, model=m, render=r)
    net = LaRaNet(cfg)
    B, H = 3, 512
    batch = synthetic_batch(B=B, n_views=cfg.n_views, H=H, W=H)
    params = jax.jit(lambda r: net.init(r, batch, with_fine=True,
                                        train=False))(jax.random.PRNGKey(0))
    mesh = make_mesh(n_dp=1, devices=jax.devices()[:1])
    sb = shard_batch(batch, mesh)

    if row == "encoder fwd (12 imgs 512^2)":
        imgs = sb["tar_rgb"][:, :4].reshape(-1, H, H, 3)
        rd = sb["tar_rays_down"][:, :4]
        rd = rd.reshape(-1, *rd.shape[2:])

        @jax.jit
        def enc(p, i, r):
            return net.apply(p, i, r, method=LaRaNet.encode_images)

        return enc, (params, imgs, rd), lambda o: float(o[0, 0, 0, 0])

    if row == "coarse fwd (24 renders)":
        fn = jax.jit(lambda p, b: net.apply(p, b, with_fine=False,
                                            train=True)["image"])
        return fn, (params, sb), lambda o: float(o[0, 0, 0, 0, 0])

    if row == "fine fwd (48 renders)":
        fn = jax.jit(lambda p, b: net.apply(p, b, with_fine=True,
                                            train=True)["image_fine"])
        return fn, (params, sb), lambda o: float(o[0, 0, 0, 0, 0])

    if row == "fine fwd + loss (no grad)":
        @jax.jit
        def loss_only(p, b):
            out = net.apply(p, b, with_fine=True, train=True)
            out = jax.lax.stop_gradient(out)
            loss, _ = compute_losses(b, out, 2000)
            return loss

        return loss_only, (params, sb), float

    if row == "coarse fwd+bwd (MSE only)":
        @jax.jit
        def grad_coarse_mse(p, b):
            def loss(pp):
                out = net.apply(pp, b, with_fine=False, train=True)
                return jnp.mean((out["image"] - b["tar_rgb"]) ** 2)
            return jax.grad(loss)(p)

        return grad_coarse_mse, (params, sb), \
            lambda o: float(jax.tree.leaves(o)[0].reshape(-1)[0])

    if row in ("FULL coarse step", "FULL fine step"):
        with_fine = row == "FULL fine step"
        tx, _ = make_optimizer(TrainConfig(grad_accum=1, warmup_iters=10), 1000)
        state = TrainState.create(apply_fn=net.apply, params=params, tx=tx)
        step = make_train_step(net, mesh, with_fine=with_fine, grad_accum=1)
        holder = {"s": state}

        def one(b):
            holder["s"], stats = step(holder["s"], b)
            return stats

        return one, (sb,), lambda o: float(o["loss"])

    raise SystemExit(f"unknown row {row!r}; choose from {ROWS}")


def run_row(row):
    fn, args, fetch = build_row(row)
    t = slope_time(fn, args, 2, 6, fetch)
    print(f"RESULT {row:30s} {t:8.3f} s", flush=True)


def run_trace(trace_dir):
    import jax

    fn, args, fetch = build_row("FULL fine step")
    fetch(fn(*args))  # compile + warm
    fetch(fn(*args))
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            out = fn(*args)
        fetch(out)
    print(f"trace written to {trace_dir} (open in Perfetto / tensorboard)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--row", default=None, help="run one row in-process")
    ap.add_argument("--trace", default=None, help="profiler trace dir")
    a = ap.parse_args()

    if a.trace:
        run_trace(a.trace)
        return
    if a.row:
        run_row(a.row)
        return

    # orchestrate: one subprocess per row (serialize device memory)
    for row in ROWS:
        r = subprocess.run([sys.executable, __file__, "--row", row],
                           capture_output=True, text=True)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("RESULT")), None)
        if line:
            print(line[7:], flush=True)
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["?"]
            print(f"{row:30s} FAILED: {tail[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
