#!/usr/bin/env python
"""A/B the round-3 rasterizer levers at the production workload:
bin_mode (sort | count) × pallas_stash_carries × pallas_cumsum,
fwd and fwd+bwd, plus a tiles_per_step sweep for the winning combo.

Prints one table; run on the real TPU. Each cell is a best-of-3 slope
timing (compile + dispatch excluded).

Usage: python tools/ab_kernels.py [--quick]
"""

import argparse
import dataclasses
import itertools
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="2 trials, no tiles_per_step sweep")
    a = ap.parse_args()
    trials = 2 if a.quick else 3

    from lara_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from bench import lara_workload
    from lara_tpu.config import RenderConfig
    from lara_tpu.models.lara import make_cameras
    from lara_tpu.ops.rasterizer import RasterizeConfig
    from lara_tpu.ops.renderer import render_view

    H = W = 512
    r = RenderConfig()
    base = RasterizeConfig(
        height=H, width=W, tile=r.tile, dup=r.dup, tile_budget=r.tile_budget,
        tile_chunk=r.tile_chunk, sh_degree=1,
        visible_budget=r.visible_budget,
        pallas_chunk=min(r.pallas_chunk, r.tile_budget),
        pallas_tiles_per_step=r.pallas_tiles_per_step, backend="pallas")

    means, shs, op_raw, sc_raw, quats = lara_workload()
    c2w = jnp.eye(4).at[2, 3].set(-1.8)
    cam = make_cameras(c2w, jnp.asarray(0.69), jnp.asarray(0.69),
                       jnp.asarray(1.0), jnp.asarray(2.6))
    bg = jnp.ones(3)
    args = (means, shs, op_raw, sc_raw, quats)

    def timed(cfg):
        @jax.jit
        def fwd(means, shs, op_raw, sc_raw, quats):
            return render_view(cam, None, means, shs, op_raw, sc_raw, quats,
                               bg, cfg)["image"]

        @jax.jit
        def fwdbwd(means, shs, op_raw, sc_raw, quats):
            def loss(*p):
                f = render_view(cam, None, *p, bg, cfg)
                return jnp.mean(f["image"]) + jnp.mean(f["rend_dist"])
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                means, shs, op_raw, sc_raw, quats)

        t_f = slope_time(fwd, args, 10, 40,
                         lambda o: float(jnp.sum(o[0, :2])), trials)
        t_fb = slope_time(fwdbwd, args, 5, 20,
                          lambda o: float(jnp.sum(o[0][0])), trials)
        return t_f, t_fb

    print(f"{'bin':6s} {'cumsum':6s} {'stash':6s} {'fwd ms':>8s} {'fps':>7s} "
          f"{'f+b ms':>8s} {'fps':>7s}")
    results = {}
    for bin_mode, cumsum, stash in itertools.product(
            ("sort", "count"), ("dot", "shift"), (False, True)):
        if not stash and a.quick:
            continue
        cfg = dataclasses.replace(base, bin_mode=bin_mode,
                                  pallas_cumsum=cumsum,
                                  pallas_stash_carries=stash)
        try:
            t_f, t_fb = timed(cfg)
            results[(bin_mode, cumsum, stash)] = (t_f, t_fb)
            print(f"{bin_mode:6s} {cumsum:6s} {str(stash):6s} "
                  f"{t_f * 1e3:8.2f} {1 / t_f:7.1f} "
                  f"{t_fb * 1e3:8.2f} {1 / t_fb:7.1f}", flush=True)
        except Exception as e:
            print(f"{bin_mode:6s} {cumsum:6s} {str(stash):6s} "
                  f"FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    if a.quick or not results:
        return
    best = min(results, key=lambda k: results[k][1])
    print(f"\nbest fwd+bwd: {best}; tiles_per_step sweep:")
    for tps in (2, 4, 8, 16):
        cfg = dataclasses.replace(
            base, bin_mode=best[0], pallas_cumsum=best[1],
            pallas_stash_carries=best[2], pallas_tiles_per_step=tps)
        try:
            t_f, t_fb = timed(cfg)
            print(f"tps={tps:3d} fwd {t_f * 1e3:7.2f} ms ({1 / t_f:6.1f} fps) "
                  f"f+b {t_fb * 1e3:7.2f} ms ({1 / t_fb:6.1f} fps)", flush=True)
        except Exception as e:
            print(f"tps={tps:3d} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
