"""Decompose compute_losses cost at the training shape (B=3, 8 views, 512²).

fine fwd = 0.62 s but fine fwd + loss = 1.68 s (tools/profile_train_step.py)
— the loss itself costs ~1 s forward. This isolates MSE / MS-SSIM / PSNR
stats / normal / distortion on fixed random tensors (no model).
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

    from lara_tpu.ops.msssim import ms_ssim
    from lara_tpu.train.loss import compute_losses, _num_scales, _MSSSIM_WEIGHTS

    B, N, H, W = 3, 8, 512, 512
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    img = jax.random.uniform(k[0], (B, N, H, W, 3))
    tar = jax.random.uniform(k[1], (B, N, H, W, 3))
    nrm = jax.random.normal(k[2], (B, N, H, W, 3))
    acc = jax.random.uniform(k[3], (B, N, H, W))
    dist = jax.random.uniform(k[4], (B, N, H, W)) * 1e-4

    batch = {"tar_rgb": tar}
    output = {
        "image": img, "rend_dist": dist, "rend_normal": nrm,
        "depth_normal": nrm * 0.9, "acc_map": acc,
        "image_fine": img * 0.99, "rend_dist_fine": dist,
        "rend_normal_fine": nrm, "depth_normal_fine": nrm * 0.9,
        "acc_map_fine": acc,
    }

    @jax.jit
    def full_loss(batch, output):
        loss, stats = compute_losses(batch, output, 2000)
        return loss

    @jax.jit
    def full_loss_grad(batch, output):
        def f(o):
            loss, _ = compute_losses(batch, o, 2000)
            return loss
        return jax.grad(f)(output)["image"].reshape(-1)[0]

    n_scales = _num_scales(H, W)
    weights = _MSSSIM_WEIGHTS[:n_scales]
    weights = tuple(w / sum(weights) for w in weights)

    @jax.jit
    def msssim_once(img, tar):
        x = img.transpose(0, 4, 2, 1, 3).reshape(B, 3, H, N * W)
        y = tar.transpose(0, 4, 2, 1, 3).reshape(B, 3, H, N * W)
        return ms_ssim(x, y, weights=weights)

    @jax.jit
    def msssim_grad(img, tar):
        g = jax.grad(lambda a: msssim_once(a, tar).sum())(img)
        return g.reshape(-1)[0]

    @jax.jit
    def mse_only(img, tar):
        return jnp.mean((img.astype(jnp.float32) - tar) ** 2)

    @jax.jit
    def normal_only(nrm, acc):
        return jnp.mean((1.0 - jnp.sum(nrm * (nrm * 0.9), -1)) * acc)

    rows = [
        ("mse", mse_only, (img, tar), float),
        ("normal-consistency", normal_only, (nrm, acc), float),
        ("ms-ssim fwd (1 head)", msssim_once, (img, tar),
         lambda o: float(o.sum())),
        ("ms-ssim fwd+bwd (1 head)", msssim_grad, (img, tar), float),
        ("compute_losses fwd", full_loss, (batch, output), float),
        ("compute_losses fwd+bwd(img)", full_loss_grad, (batch, output),
         lambda o: float(o)),
    ]
    for name, fn, a, fetch in rows:
        t = slope_time(fn, a, 3, 9, fetch)
        print(f"{name:30s} {t * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()
