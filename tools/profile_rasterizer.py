"""Stage-level rasterizer profile at the production training config.

Times each pipeline stage (preprocess / binning / window gather / pallas
blend) forward and backward on the real chip with the trained-scene
workload from bench.py, so perf work targets the measured budget rather
than guesses. Run: `python tools/profile_rasterizer.py [--dup 3] ...`
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--dup", type=int, default=3)
    ap.add_argument("--tile", type=int, default=0, help="tile edge px (0=config default)")
    ap.add_argument("--tile-budget", type=int, default=128)
    ap.add_argument("--visible-budget", type=int, default=131072)
    ap.add_argument("--chunk", type=int, default=0, help="pallas_chunk (0=config default)")
    ap.add_argument("--tpg", type=int, default=0, help="pallas_tiles_per_step")
    ap.add_argument("--reps", type=int, default=(10, 30), nargs=2)
    ap.add_argument("--quick", action="store_true",
                    help="only time FULL fwd and FULL fwd+bwd")
    ap.add_argument("--take-mode", default=None, choices=["xla", "lazy", "inv"],
                    help="take_rows transpose mode (lara_tpu.ops.gather)")
    ap.add_argument("--window-mode", default=None, choices=["xla", "lazy"],
                    help="window_gather transpose mode")
    ap.add_argument("--cumsum", default=None, choices=["dot", "shift", "prod"],
                    help="pallas blend per-chunk prefix-sum algorithm")
    args = ap.parse_args()

    from lara_tpu.ops import gather as gather_mod
    if args.take_mode:
        gather_mod.TAKE_ROWS_MODE = args.take_mode
    if args.window_mode:
        gather_mod.WINDOW_MODE = args.window_mode

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lara_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import lara_workload
    from lara_tpu.config import RenderConfig
    from lara_tpu.models.lara import make_cameras
    from lara_tpu.ops.rasterizer import RasterizeConfig
    from lara_tpu.ops.rasterizer.pallas_blend import blend_tiles_pallas
    from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels
    from lara_tpu.ops.rasterizer.tiled import bin_surfels
    from lara_tpu.ops.renderer import render_view

    H = W = 512
    r = RenderConfig()
    cfg = RasterizeConfig(
        height=H, width=W, tile=args.tile or r.tile, dup=args.dup,
        tile_budget=args.tile_budget, tile_chunk=r.tile_chunk, sh_degree=1,
        visible_budget=args.visible_budget,
        pallas_chunk=min(args.chunk or r.pallas_chunk, args.tile_budget),
        pallas_tiles_per_step=args.tpg or r.pallas_tiles_per_step,
        pallas_cumsum=args.cumsum or r.pallas_cumsum,
        backend="pallas")

    means, shs, op_raw, sc_raw, quats = lara_workload()
    c2w = jnp.eye(4).at[2, 3].set(-1.8)
    cam = make_cameras(c2w, jnp.asarray(0.69), jnp.asarray(0.69),
                       jnp.asarray(1.0), jnp.asarray(2.6))
    bg = jnp.ones(3)
    prm = (means, shs, op_raw, sc_raw, quats)
    r1, r2 = args.reps

    def act(means, shs, op_raw, sc_raw, quats):
        return (means, shs, jax.nn.sigmoid(op_raw), jnp.exp(sc_raw),
                quats / jnp.linalg.norm(quats, axis=-1, keepdims=True))

    @jax.jit
    def f_pre(*p):
        m, s, o, sc, q = act(*p)
        g = preprocess_surfels(m, s, o, sc, q, cam, cfg)
        return g.center_cam, g.radius

    from lara_tpu.ops.rasterizer.tiled import pack_surfels
    from lara_tpu.ops.gather import take_rows

    @jax.jit
    def f_argsort(*p):
        m, s, o, sc, q = act(*p)
        g = preprocess_surfels(m, s, o, sc, q, cam, cfg)
        return jnp.argsort(jnp.where(g.valid, g.depth, jnp.inf))

    @jax.jit
    def f_pack(*p):
        m, s, o, sc, q = act(*p)
        g = preprocess_surfels(m, s, o, sc, q, cam, cfg)
        order = jnp.argsort(jnp.where(g.valid, g.depth, jnp.inf))
        order_v = jax.lax.slice_in_dim(order, 0, cfg.visible_budget)
        return take_rows(pack_surfels(g), order_v), g.center2d[order_v]

    @jax.jit
    def f_keysort(*p):
        m, s, o, sc, q = act(*p)
        g = preprocess_surfels(m, s, o, sc, q, cam, cfg)
        order = jnp.argsort(jnp.where(g.valid, g.depth, jnp.inf))
        order_v = jax.lax.slice_in_dim(order, 0, cfg.visible_budget)
        c2d = g.center2d[order_v]
        radius = g.radius[order_v]
        valid = g.valid[order_v]
        tile = cfg.tile
        tx_lo = jnp.clip(jnp.floor((c2d[:, 0] - radius) / tile), 0, cfg.tiles_x - 1).astype(jnp.int32)
        ty_lo = jnp.clip(jnp.floor((c2d[:, 1] - radius) / tile), 0, cfg.tiles_y - 1).astype(jnp.int32)
        tx_hi = jnp.clip(jnp.floor((c2d[:, 0] + radius) / tile), 0, cfg.tiles_x - 1).astype(jnp.int32)
        ty_hi = jnp.clip(jnp.floor((c2d[:, 1] + radius) / tile), 0, cfg.tiles_y - 1).astype(jnp.int32)
        d = cfg.dup
        si = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0).reshape(-1)
        sj = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1).reshape(-1)
        tx = tx_lo[:, None] + sj[None, :]
        ty = ty_lo[:, None] + si[None, :]
        slot_ok = (tx <= tx_hi[:, None]) & (ty <= ty_hi[:, None]) & valid[:, None]
        tile_id = jnp.where(slot_ok, ty * cfg.tiles_x + tx, cfg.num_tiles)
        n = cfg.visible_budget
        gidx = jax.lax.broadcasted_iota(jnp.int32, (n, d * d), 0)
        keys = ((tile_id << 19) | gidx).reshape(-1)
        return jax.lax.sort(keys)

    @jax.jit
    def f_bin(*p):
        m, s, o, sc, q = act(*p)
        g = preprocess_surfels(m, s, o, sc, q, cam, cfg)
        packed, win_gidx, ev, counts = bin_surfels(g, cfg)
        return packed, win_gidx, counts

    @jax.jit
    def f_gather(*p):
        m, s, o, sc, q = act(*p)
        g = preprocess_surfels(m, s, o, sc, q, cam, cfg)
        packed, win_gidx, ev, counts = bin_surfels(g, cfg)
        return packed[win_gidx], counts

    @jax.jit
    def f_full(*p):
        return render_view(cam, None, *p, bg, cfg)["image"]

    @jax.jit
    def f_full_bwd(*p):
        def loss(*a):
            f = render_view(cam, None, *a, bg, cfg)
            return jnp.mean(f["image"]) + jnp.mean(f["rend_dist"])
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*p)

    # isolate the pallas blend fwd / fwd+bwd given fixed entries
    entries, counts = f_gather(*prm)
    entries = jax.block_until_ready(entries)
    scalars = jnp.stack([jnp.asarray(cam.tanfovx, jnp.float32).reshape(()),
                         jnp.asarray(cam.tanfovy, jnp.float32).reshape(())])

    @jax.jit
    def f_blend(entries):
        return blend_tiles_pallas(entries, counts, scalars, cfg)

    @jax.jit
    def f_blend_bwd(entries):
        def loss(e):
            return jnp.sum(blend_tiles_pallas(e, counts, scalars, cfg))
        return jax.grad(loss)(entries)

    # isolate the gather-chain backward: d(sum(entries @ w)) / d params
    @jax.jit
    def f_chain_bwd(*p):
        def loss(*a):
            m, s, o, sc, q = act(*a)
            g = preprocess_surfels(m, s, o, sc, q, cam, cfg)
            packed, win_gidx, ev, counts = bin_surfels(g, cfg)
            e = packed[win_gidx]
            return jnp.sum(e * e)
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*p)

    # isolate the window-gather transpose: custom VJP vs XLA scatter-add
    pass

    @jax.jit
    def f_bin_idx(*p):
        m, s, o, sc, q = act(*p)
        g = preprocess_surfels(m, s, o, sc, q, cam, cfg)
        packed, win_gidx, ev, counts = bin_surfels(g, cfg)
        return packed, win_gidx, ev

    packed, win_gidx, ev = jax.block_until_ready(f_bin_idx(*prm))
    evf = ev[..., None].astype(jnp.float32)

    # the quadratic makes the cotangent input-dependent — a constant
    # cotangent lets XLA fold the whole transpose at compile time
    @jax.jit
    def f_wg_bwd(packed):
        def loss(p):
            e = gather_mod._window_gather_lazy(p, win_gidx, ev, cfg.dup ** 2)
            return jnp.sum(e * e * evf)
        return jax.grad(loss)(packed)

    @jax.jit
    def f_xla_scatter_bwd(packed):
        def loss(p):
            e = p[win_gidx]
            return jnp.sum(e * e * evf)
        return jax.grad(loss)(packed)

    rows = [
        ("wg custom bwd", f_wg_bwd, (packed,), lambda o: float(o[0, 0])),
        ("wg xla-scatter bwd", f_xla_scatter_bwd, (packed,),
         lambda o: float(o[0, 0])),
        ("preprocess fwd", f_pre, prm, lambda o: float(o[1][0])),
        ("pre+argsort fwd", f_argsort, prm, lambda o: int(o[0])),
        ("pre+argsort+pack fwd", f_pack, prm, lambda o: float(o[0][0, 0])),
        ("pre+...+keysort fwd", f_keysort, prm, lambda o: int(o[0])),
        ("pre+bin fwd", f_bin, prm, lambda o: float(o[2][0])),
        ("pre+bin+gather fwd", f_gather, prm, lambda o: float(o[0][0, 0, 0])),
        ("blend only fwd", f_blend, (entries,), lambda o: float(o[0, 0, 0])),
        ("blend only fwd+bwd", f_blend_bwd, (entries,),
         lambda o: float(o[0, 0, 0])),
        ("chain (no blend) fwd+bwd", f_chain_bwd, prm,
         lambda o: float(o[0][0, 0])),
        ("FULL fwd", f_full, prm, lambda o: float(o[0, 0, 0])),
        ("FULL fwd+bwd", f_full_bwd, prm, lambda o: float(o[0][0, 0])),
    ]
    if args.quick:
        rows = rows[-2:]
    print(f"config: dup={cfg.dup} tile_budget={cfg.tile_budget} "
          f"visible_budget={cfg.visible_budget} chunk={cfg.pallas_chunk} "
          f"tpg={cfg.pallas_tiles_per_step}")
    for name, fn, a, fetch in rows:
        t = slope_time(fn, a, r1, r2, fetch)
        print(f"{name:28s} {t * 1e3:8.2f} ms   {1.0 / t:8.1f} /s")


if __name__ == "__main__":
    main()
