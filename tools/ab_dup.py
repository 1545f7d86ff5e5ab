#!/usr/bin/env python
"""A/B the rasterizer dup fan-out (and optional tile size) at the production
workload: dup=3 claims a 3×3 tile ring (16 px radius clamp at tile=16) and
sorts V·9 keys; dup=2 claims 2×2 (8 px clamp) and sorts V·4 — the key sort
is the second-largest binning stage, but a tighter clamp truncates more
large surfels (measured here as overflow fraction + image delta vs the
unclamped reference backend at 128²).

Usage: python tools/ab_dup.py
"""

import sys
import time

sys.path.insert(0, ".")


def slope_time(fn, args, r1, r2, fetch, trials=3):
    out = fn(*args)
    fetch(out)

    def run(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(*args)
        fetch(o)
        return time.perf_counter() - t0

    best = None
    for _ in range(trials):
        a, b = run(r1), run(r2)
        t = max((b - a) / (r2 - r1), 1e-9)
        best = t if best is None else min(best, t)
    return best


def main():
    from lara_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from bench import lara_workload
    from lara_tpu.config import RenderConfig
    from lara_tpu.models.lara import make_cameras
    from lara_tpu.ops.rasterizer import RasterizeConfig
    from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels
    from lara_tpu.ops.renderer import (opacity_activation, render_view,
                                       rotation_activation, scaling_activation)

    H = W = 512
    r = RenderConfig()
    means, shs, op_raw, sc_raw, quats = lara_workload()
    c2w = jnp.eye(4).at[2, 3].set(-1.8)
    cam = make_cameras(c2w, jnp.asarray(0.69), jnp.asarray(0.69),
                       jnp.asarray(1.0), jnp.asarray(2.6))
    bg = jnp.ones(3)

    def cfg_for(dup, tile=None):
        tile = tile or r.tile
        return RasterizeConfig(
            height=H, width=W, tile=tile, dup=dup,
            tile_budget=r.tile_budget, tile_chunk=r.tile_chunk, sh_degree=1,
            visible_budget=r.visible_budget,
            pallas_chunk=min(r.pallas_chunk, r.tile_budget),
            pallas_tiles_per_step=r.pallas_tiles_per_step, backend="pallas")

    args = (means, shs, op_raw, sc_raw, quats)
    results = {}
    for dup in (3, 2):
        cfg = cfg_for(dup)

        @jax.jit
        def fwd(means, shs, op_raw, sc_raw, quats, cfg=cfg):
            return render_view(cam, None, means, shs, op_raw, sc_raw, quats,
                               bg, cfg)["image"]

        @jax.jit
        def fwdbwd(means, shs, op_raw, sc_raw, quats, cfg=cfg):
            def loss(*a):
                f = render_view(cam, None, *a, bg, cfg)
                return jnp.mean(f["image"]) + jnp.mean(f["rend_dist"])
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                means, shs, op_raw, sc_raw, quats)

        @jax.jit
        def overflow(cfg=cfg):
            _, ov = preprocess_surfels(
                means, shs, opacity_activation(op_raw),
                scaling_activation(sc_raw), rotation_activation(quats), cam,
                cfg, return_overflow=True)
            return ov

        t_f = slope_time(fwd, args, 10, 40, lambda o: float(jnp.sum(o[0, :2])))
        t_fb = slope_time(fwdbwd, args, 5, 20, lambda o: float(jnp.sum(o[0][0])))
        img = fwd(*args)
        results[dup] = dict(fwd_ms=t_f * 1e3, fps=1 / t_f,
                            fwdbwd_ms=t_fb * 1e3, fb_fps=1 / t_fb,
                            overflow=float(overflow()))
        if 3 in results and dup != 3:
            ref_img = None  # compare below
        print(f"dup={dup}: fwd {t_f*1e3:.2f} ms ({1/t_f:.1f} fps), "
              f"fwd+bwd {t_fb*1e3:.2f} ms ({1/t_fb:.1f} fps), "
              f"radius-overflow {results[dup]['overflow']:.5f}", flush=True)

    # image agreement dup=2 vs dup=3 at the bench scene
    img3 = jax.jit(lambda *a: render_view(cam, None, *a, bg, cfg_for(3))["image"])(*args)
    img2 = jax.jit(lambda *a: render_view(cam, None, *a, bg, cfg_for(2))["image"])(*args)
    d = jnp.abs(img3 - img2)
    mse = float(jnp.mean((img3 - img2) ** 2))
    psnr = 10 * jnp.log10(1.0 / max(mse, 1e-12))
    print(f"dup2-vs-dup3 image: max|Δ| {float(jnp.max(d)):.4f}, "
          f"PSNR {float(psnr):.1f} dB", flush=True)


if __name__ == "__main__":
    main()
