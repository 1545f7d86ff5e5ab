"""Component-level profile of the full fine train step at B=3, 512².

Splits the 4+ s step into: coarse forward, fine forward, loss-only
(MS-SSIM ×2 heads), full coarse step, full fine step — so model-side work
(ViT, volume transformer, top_k fine selection, grid samples) is separated
from the 48 rasterizer invocations. Run on the real chip.
"""

import sys
import time

sys.path.insert(0, ".")


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


def main():
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
    net = LaRaNet(cfg)
    B, H = 3, 512
    batch = synthetic_batch(B=B, n_views=cfg.n_views, H=H, W=H)
    params = jax.jit(lambda r: net.init(r, batch, with_fine=True,
                                        train=False))(jax.random.PRNGKey(0))
    mesh = make_mesh(n_dp=1, devices=jax.devices()[:1])
    sb = shard_batch(batch, mesh)

    @jax.jit
    def fwd_coarse(params, b):
        return net.apply(params, b, with_fine=False, train=True)["image"]

    @jax.jit
    def fwd_fine(params, b):
        return net.apply(params, b, with_fine=True, train=True)["image_fine"]

    @jax.jit
    def loss_only(params, b):
        out = net.apply(params, b, with_fine=True, train=True)
        out = jax.lax.stop_gradient(out)
        loss, _ = compute_losses(b, out, 2000)
        return loss

    def make_step(with_fine):
        tx, _ = make_optimizer(TrainConfig(grad_accum=1, warmup_iters=10), 1000)
        state = TrainState.create(apply_fn=net.apply, params=params, tx=tx)
        step = make_train_step(net, mesh, with_fine=with_fine, grad_accum=1)
        holder = {"s": state}

        def one(b):
            holder["s"], stats = step(holder["s"], b)
            return stats

        return one

    @jax.jit
    def grad_coarse_mse(params, b):
        def loss(p):
            out = net.apply(p, b, with_fine=False, train=True)
            return jnp.mean((out["image"] - b["tar_rgb"]) ** 2)
        return jax.grad(loss)(params)

    rows = [
        ("coarse fwd (24 renders)", fwd_coarse, (params, sb),
         lambda o: float(o[0, 0, 0, 0, 0])),
        ("fine fwd (48 renders)", fwd_fine, (params, sb),
         lambda o: float(o[0, 0, 0, 0, 0])),
        ("fine fwd + loss (no grad)", loss_only, (params, sb),
         lambda o: float(o)),
        ("coarse fwd+bwd (MSE only)", grad_coarse_mse, (params, sb),
         lambda o: float(jax.tree.leaves(o)[0].reshape(-1)[0])),
        ("FULL coarse step", make_step(False), (sb,),
         lambda o: float(o["loss"])),
        ("FULL fine step", make_step(True), (sb,),
         lambda o: float(o["loss"])),
    ]
    for name, fn, a, fetch in rows:
        # fine_budget 131072 makes some decomposition blocks exceed HBM when
        # their buffers coexist with earlier rows' live executables — skip
        # and continue rather than aborting the remaining rows
        try:
            t = slope_time(fn, a, 2, 6, fetch)
            print(f"{name:30s} {t:8.3f} s")
        except Exception as e:
            print(f"{name:30s} skipped ({type(e).__name__})")


if __name__ == "__main__":
    main()
