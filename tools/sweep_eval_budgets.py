#!/usr/bin/env python
"""Sweep the EVAL rasterizer budgets (serving path): render-only fps and
PSNR vs the full-budget reference at the trained-statistics workload.

The evaluate.py hot loop renders at eval_tile_budget/eval_visible_budget
(config.py RenderConfig) — 4× / 2× the train budgets. If a smaller budget
holds PSNR, serving throughput rises for free. Run on the real TPU:

    python tools/sweep_eval_budgets.py
"""

import sys
import time

sys.path.insert(0, ".")

from lara_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lara_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import lara_workload
    from lara_tpu.config import RenderConfig
    from lara_tpu.models.lara import make_cameras
    from lara_tpu.ops.rasterizer import RasterizeConfig, rasterize

    H = W = 512
    r = RenderConfig()

    def cfg_for(tile_budget, visible):
        return RasterizeConfig(
            height=H, width=W, tile=r.tile, dup=r.dup,
            tile_budget=tile_budget, tile_chunk=r.tile_chunk, sh_degree=1,
            visible_budget=visible,
            pallas_chunk=min(r.pallas_chunk, tile_budget),
            pallas_tiles_per_step=r.pallas_tiles_per_step,
            pallas_cumsum=r.pallas_cumsum, bin_mode=r.bin_mode,
            pack_mode=r.pack_mode, backend="pallas")

    means, shs, op_raw, sc_raw, quats = lara_workload()
    c2w = jnp.eye(4).at[2, 3].set(-1.8)
    cam = make_cameras(c2w, jnp.asarray(0.69), jnp.asarray(0.69),
                       jnp.asarray(1.0), jnp.asarray(2.6))
    bg = jnp.ones(3)
    op = jax.nn.sigmoid(op_raw)
    sc = jnp.exp(sc_raw)
    qn = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)

    def render(cfg):
        # args passed through jit (a nullary closure constant-folds: XLA
        # folded the whole reference render into a constant, timing 0 ms)
        return jax.jit(lambda m, s, o, c, q: rasterize(
            m, s, o, c, q, cam, bg, cfg).image)

    # reference: the current eval budgets
    ref_cfg = cfg_for(r.eval_tile_budget, r.eval_visible_budget)
    ref_fn = render(ref_cfg)
    args = (means, shs, op, sc, qn)
    ref = jax.block_until_ready(ref_fn(*args))

    grid = [
        (r.eval_tile_budget, r.eval_visible_budget),
        (256, 262144),
        (256, 131072),
        (128, 131072),
    ]
    print(f"{'tileK':>6s} {'visK':>8s} {'ms':>8s} {'fps':>7s} {'psnr':>7s}")
    for tk, vk in grid:
        fn0 = render(cfg_for(tk, vk))
        fn = lambda: fn0(*args)
        img = jax.block_until_ready(fn())
        # slope timing
        def run(reps):
            t0 = time.perf_counter()
            o = None
            for _ in range(reps):
                o = fn()
            float(jnp.sum(o[:2, :2]))
            return time.perf_counter() - t0
        a, b = run(4), run(12)
        t = max((b - a) / 8, 1e-9)
        mse = float(jnp.mean((img - ref) ** 2))
        psnr = float("inf") if mse == 0 else -10.0 * jnp.log10(mse)
        print(f"{tk:6d} {vk:8d} {t * 1e3:8.2f} {1 / t:7.1f} {psnr:7.2f}",
              flush=True)


if __name__ == "__main__":
    main()
