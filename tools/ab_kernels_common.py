"""Shared harness for the rasterizer A/B tools: build the production
512²/524k-surfel workload once and return a `timed(cfg)` closure measuring
fwd and fwd+bwd seconds per frame (best-of-N slope timing, compile and
dispatch excluded)."""

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


def make_timed_render(trials=3):
    """Returns (timed, base_cfg): `timed(cfg)` -> (fwd_s, fwdbwd_s) on the
    production workload; `base_cfg` is the RenderConfig-derived
    RasterizeConfig the bench uses."""
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
        pallas_tiles_per_step=r.pallas_tiles_per_step,
        pallas_stash_carries=r.pallas_stash_carries,
        pallas_cumsum=r.pallas_cumsum,
        bin_mode=r.bin_mode, pack_mode=r.pack_mode, backend="pallas")

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

    return timed, base
