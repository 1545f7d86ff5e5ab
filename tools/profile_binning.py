#!/usr/bin/env python
"""Binning-stage experiments for the round-3 rasterizer push.

Times each binning stage at the production config (N=524288 surfels,
visible_budget=131072, dup=3, T=1024 tiles, K=128) and A/Bs the candidate
restructures:

  A. per-stage timings of the current single-view pipeline (baseline);
  B. the same stages batched over NV views in one call (batched sorts/
     gathers vectorize across sublanes; per-view scan does not);
  C. window extraction via one flat element-gather vs vmap(dynamic_slice)
     vs a Pallas scalar-prefetch copy kernel.

Usage:  python tools/profile_binning.py [--views 8]
"""

import argparse
import functools
import sys
import time

import numpy as np

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
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    a = ap.parse_args()

    from lara_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from bench import lara_workload
    from lara_tpu.config import RenderConfig
    from lara_tpu.models.lara import make_cameras
    from lara_tpu.ops.rasterizer import RasterizeConfig
    from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels
    from lara_tpu.ops.rasterizer.tiled import pack_surfels, _GIDX_BITS
    from lara_tpu.ops.renderer import (opacity_activation, rotation_activation,
                                       scaling_activation)

    H = W = 512
    r = RenderConfig()
    cfg = RasterizeConfig(
        height=H, width=W, tile=r.tile, dup=r.dup, tile_budget=r.tile_budget,
        tile_chunk=r.tile_chunk, sh_degree=1, visible_budget=r.visible_budget,
        pallas_chunk=min(r.pallas_chunk, r.tile_budget),
        pallas_tiles_per_step=r.pallas_tiles_per_step, backend="pallas")
    NV = a.views
    V = cfg.visible_budget
    K = cfg.tile_budget
    T = cfg.num_tiles

    means, shs, op_raw, sc_raw, quats = lara_workload()
    op = opacity_activation(op_raw)
    sc = scaling_activation(sc_raw)
    qn = rotation_activation(quats)

    # NV cameras orbiting the scene
    cams = []
    for i in range(NV):
        ang = 2 * np.pi * i / NV
        c2w = np.eye(4)
        c2w[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                                [-np.sin(ang), 0, np.cos(ang)]])
        c2w[:3, 3] = -c2w[:3, :3] @ np.array([0, 0, 1.8])
        cams.append(c2w)
    c2ws = jnp.asarray(np.stack(cams), jnp.float32)
    cam_b = make_cameras(c2ws, jnp.asarray(0.69), jnp.asarray(0.69),
                         jnp.asarray(1.0), jnp.asarray(2.6))
    cam0 = jax.tree.map(lambda x: x[0], cam_b)

    pp = jax.jit(lambda c: preprocess_surfels(means, shs, op, sc, qn, c, cfg))
    g0 = jax.block_until_ready(pp(cam0))
    g_b = jax.jit(jax.vmap(lambda c: preprocess_surfels(
        means, shs, op, sc, qn, c, cfg)))(cam_b)
    g_b = jax.block_until_ready(g_b)

    res = {}

    # ---- A. single-view stages --------------------------------------------
    @jax.jit
    def stage_argsort(depth, valid):
        return jnp.argsort(jnp.where(valid, depth, jnp.inf))[:V]

    order0 = stage_argsort(g0.depth, g0.valid)
    res["argsort_1"] = slope_time(stage_argsort, (g0.depth, g0.valid), 10, 40,
                                  lambda o: int(o[0]), a.trials)

    @jax.jit
    def stage_pack(g, order):
        return pack_surfels(g)[order]

    packed0 = stage_pack(g0, order0)
    res["pack_gather_1"] = slope_time(stage_pack, (g0, order0), 10, 40,
                                      lambda o: float(o[0, 0]), a.trials)

    def keys_of(g, order):
        c2d = g.center2d[order]
        radius = g.radius[order]
        valid = g.valid[order]
        tile = cfg.tile
        tx_lo = jnp.clip(jnp.floor((c2d[:, 0] - radius) / tile), 0,
                         cfg.tiles_x - 1).astype(jnp.int32)
        ty_lo = jnp.clip(jnp.floor((c2d[:, 1] - radius) / tile), 0,
                         cfg.tiles_y - 1).astype(jnp.int32)
        tx_hi = jnp.clip(jnp.floor((c2d[:, 0] + radius) / tile), 0,
                         cfg.tiles_x - 1).astype(jnp.int32)
        ty_hi = jnp.clip(jnp.floor((c2d[:, 1] + radius) / tile), 0,
                         cfg.tiles_y - 1).astype(jnp.int32)
        d = cfg.dup
        si = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0).reshape(-1)
        sj = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1).reshape(-1)
        tx = tx_lo[:, None] + sj[None, :]
        ty = ty_lo[:, None] + si[None, :]
        ok = (tx <= tx_hi[:, None]) & (ty <= ty_hi[:, None]) & valid[:, None]
        tile_id = jnp.where(ok, ty * cfg.tiles_x + tx, cfg.num_tiles)
        gidx = jax.lax.broadcasted_iota(jnp.int32, (V, d * d), 0)
        return ((tile_id << _GIDX_BITS) | gidx).reshape(-1)

    keys0 = jax.jit(lambda g, o: keys_of(g, o))(g0, order0)
    keys0 = jax.block_until_ready(keys0)

    res["keybuild_1"] = slope_time(jax.jit(keys_of), (g0, order0), 10, 40,
                                   lambda o: int(o[0]), a.trials)

    sort1 = jax.jit(lambda k: jax.lax.sort(k))
    skeys0 = jax.block_until_ready(sort1(keys0))
    res["keysort_1"] = slope_time(sort1, (keys0,), 10, 40,
                                  lambda o: int(o[0]), a.trials)

    @jax.jit
    def stage_bounds(sk):
        tids = (jnp.arange(cfg.num_tiles + 1, dtype=jnp.int32) << _GIDX_BITS)
        return jnp.searchsorted(sk, tids).astype(jnp.int32)

    bounds0 = jax.block_until_ready(stage_bounds(skeys0))
    res["searchsorted_1"] = slope_time(stage_bounds, (skeys0,), 10, 40,
                                       lambda o: int(o[0]), a.trials)
    starts0 = bounds0[:-1]

    @jax.jit
    def win_dynslice(sk, starts):
        padded = jnp.concatenate(
            [sk, jnp.full((K,), jnp.iinfo(jnp.int32).max, jnp.int32)])
        return jax.vmap(lambda s: jax.lax.dynamic_slice(padded, (s,), (K,)))(starts)

    w0 = jax.block_until_ready(win_dynslice(skeys0, starts0))
    res["win_dynslice_1"] = slope_time(win_dynslice, (skeys0, starts0), 10, 40,
                                       lambda o: int(o[0, 0]), a.trials)

    @jax.jit
    def win_flatgather(sk, starts):
        padded = jnp.concatenate(
            [sk, jnp.full((K,), jnp.iinfo(jnp.int32).max, jnp.int32)])
        flat = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        return padded[flat]

    jax.block_until_ready(win_flatgather(skeys0, starts0))
    res["win_flatgather_1"] = slope_time(win_flatgather, (skeys0, starts0),
                                         10, 40, lambda o: int(o[0, 0]), a.trials)

    # Pallas window extraction: grid over tile blocks, scalar-prefetch starts,
    # whole sorted array resident in VMEM (pad to 1.18M i32 = 4.7MB).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = int(keys0.shape[0])
    TPB = 8  # tiles per grid step

    def win_kernel(starts_ref, sk_ref, out_ref):
        blk = pl.program_id(0)
        for ts in range(TPB):
            t = blk * TPB + ts
            s = starts_ref[t]
            out_ref[ts, :] = sk_ref[pl.ds(s, K)]

    @jax.jit
    def win_pallas(sk, starts):
        padded = jnp.concatenate(
            [sk, jnp.full((K,), jnp.iinfo(jnp.int32).max, jnp.int32)])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // TPB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((TPB, K), lambda t, *_: (t, 0)),
        )
        return pl.pallas_call(
            win_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, K), jnp.int32),
        )(starts, padded)

    try:
        wp = jax.block_until_ready(win_pallas(skeys0, starts0))
        assert np.array_equal(np.asarray(wp), np.asarray(w0)), "pallas window mismatch"
        res["win_pallas_1"] = slope_time(win_pallas, (skeys0, starts0), 10, 40,
                                         lambda o: int(o[0, 0]), a.trials)
    except Exception as e:
        res["win_pallas_1"] = f"FAILED {type(e).__name__}: {e}"

    # row window gather
    @jax.jit
    def stage_rows(packed, win):
        gidx = win & ((1 << _GIDX_BITS) - 1)
        return packed[gidx]

    jax.block_until_ready(stage_rows(packed0, w0))
    res["row_gather_1"] = slope_time(stage_rows, (packed0, w0), 10, 40,
                                     lambda o: float(o[0, 0, 0]), a.trials)

    # ---- B. batched over NV views -----------------------------------------
    bs_argsort = jax.jit(jax.vmap(stage_argsort))
    order_b = jax.block_until_ready(bs_argsort(g_b.depth, g_b.valid))
    res[f"argsort_b{NV}"] = slope_time(bs_argsort, (g_b.depth, g_b.valid),
                                       5, 20, lambda o: int(o[0, 0]), a.trials)

    bs_pack = jax.jit(jax.vmap(stage_pack))
    packed_b = jax.block_until_ready(bs_pack(g_b, order_b))
    res[f"pack_gather_b{NV}"] = slope_time(bs_pack, (g_b, order_b), 5, 20,
                                           lambda o: float(o[0, 0, 0]), a.trials)

    bs_keys = jax.jit(jax.vmap(keys_of))
    keys_b = jax.block_until_ready(bs_keys(g_b, order_b))
    res[f"keybuild_b{NV}"] = slope_time(bs_keys, (g_b, order_b), 5, 20,
                                        lambda o: int(o[0, 0]), a.trials)

    sort_b = jax.jit(lambda k: jax.lax.sort(k, dimension=1))
    skeys_b = jax.block_until_ready(sort_b(keys_b))
    res[f"keysort_b{NV}"] = slope_time(sort_b, (keys_b,), 5, 20,
                                       lambda o: int(o[0, 0]), a.trials)

    bs_bounds = jax.jit(jax.vmap(stage_bounds))
    bounds_b = jax.block_until_ready(bs_bounds(skeys_b))
    res[f"searchsorted_b{NV}"] = slope_time(bs_bounds, (skeys_b,), 5, 20,
                                            lambda o: int(o[0, 0]), a.trials)
    starts_b = bounds_b[:, :-1]

    bs_win = jax.jit(jax.vmap(win_dynslice))
    win_b = jax.block_until_ready(bs_win(skeys_b, starts_b))
    res[f"win_dynslice_b{NV}"] = slope_time(bs_win, (skeys_b, starts_b), 5, 20,
                                            lambda o: int(o[0, 0, 0]), a.trials)

    bs_winf = jax.jit(jax.vmap(win_flatgather))
    jax.block_until_ready(bs_winf(skeys_b, starts_b))
    res[f"win_flatgather_b{NV}"] = slope_time(bs_winf, (skeys_b, starts_b),
                                              5, 20, lambda o: int(o[0, 0, 0]),
                                              a.trials)

    bs_rows = jax.jit(jax.vmap(stage_rows))
    jax.block_until_ready(bs_rows(packed_b, win_b))
    res[f"row_gather_b{NV}"] = slope_time(bs_rows, (packed_b, win_b), 5, 20,
                                          lambda o: float(o[0, 0, 0, 0]),
                                          a.trials)

    # one fused batched binning graph (all stages in one jit)
    @jax.jit
    def fused_binning_b(g):
        order = jax.vmap(stage_argsort)(g.depth, g.valid)
        packed = jax.vmap(stage_pack)(g, order)
        keys = jax.vmap(keys_of)(g, order)
        sk = jax.lax.sort(keys, dimension=1)
        sk = jax.lax.optimization_barrier(sk)
        bounds = jax.vmap(stage_bounds)(sk)
        starts = jax.lax.optimization_barrier(bounds[:, :-1])
        win = jax.vmap(win_flatgather)(sk, starts)
        win = jax.lax.optimization_barrier(win)
        rows = jax.vmap(stage_rows)(packed, win)
        return rows, bounds

    jax.block_until_ready(fused_binning_b(g_b))
    res[f"fused_binning_b{NV}"] = slope_time(
        fused_binning_b, (g_b,), 5, 20, lambda o: float(o[0][0, 0, 0, 0]),
        a.trials)

    @jax.jit
    def fused_binning_1(g):
        order = stage_argsort(g.depth, g.valid)
        packed = stage_pack(g, order)
        keys = keys_of(g, order)
        sk = jax.lax.sort(keys)
        sk = jax.lax.optimization_barrier(sk)
        bounds = stage_bounds(sk)
        starts = jax.lax.optimization_barrier(bounds[:-1])
        win = win_dynslice(sk, starts)
        win = jax.lax.optimization_barrier(win)
        rows = stage_rows(packed, win)
        return rows, bounds

    jax.block_until_ready(fused_binning_1(g0))
    res["fused_binning_1"] = slope_time(
        fused_binning_1, (g0,), 10, 40, lambda o: float(o[0][0, 0, 0]),
        a.trials)

    # ---- C. sort vs counting-sort window construction ---------------------
    from lara_tpu.ops.rasterizer.tiled import (_pack_tile_bounds,
                                               _windows_count, _windows_sort,
                                               bin_view)

    @jax.jit
    def stage_bounds_v(g, order):
        return _pack_tile_bounds(g, cfg)[order]

    bv0 = jax.block_until_ready(stage_bounds_v(g0, order0))
    wsort = jax.jit(functools.partial(_windows_sort, cfg=cfg))
    wcount = jax.jit(functools.partial(_windows_count, cfg=cfg))
    ws0 = jax.block_until_ready(wsort(bv0))
    wc0 = jax.block_until_ready(wcount(bv0))
    ev = np.asarray(ws0[1])
    assert np.array_equal(np.asarray(ws0[0])[ev], np.asarray(wc0[0])[ev]), (
        "count-mode windows diverge from sort-mode")
    res["windows_sort_1"] = slope_time(wsort, (bv0,), 10, 40,
                                       lambda o: int(o[2][0]), a.trials)
    res["windows_count_1"] = slope_time(wcount, (bv0,), 10, 40,
                                        lambda o: int(o[2][0]), a.trials)

    bs_wsort = jax.jit(jax.vmap(wsort))
    bs_wcount = jax.jit(jax.vmap(wcount))
    bv_b = jax.block_until_ready(jax.jit(jax.vmap(stage_bounds_v))(g_b, order_b))
    jax.block_until_ready(bs_wsort(bv_b))
    jax.block_until_ready(bs_wcount(bv_b))
    res[f"windows_sort_b{NV}"] = slope_time(bs_wsort, (bv_b,), 5, 20,
                                            lambda o: int(o[2][0, 0]), a.trials)
    res[f"windows_count_b{NV}"] = slope_time(bs_wcount, (bv_b,), 5, 20,
                                             lambda o: int(o[2][0, 0]), a.trials)

    import dataclasses as _dc
    for mode in ("sort", "count"):
        cfg_m = _dc.replace(cfg, bin_mode=mode)
        f = jax.jit(lambda c, cfgm=cfg_m: bin_view(
            preprocess_surfels(means, shs, op, sc, qn, c, cfgm), cfgm))
        jax.block_until_ready(f(cam0))
        res[f"bin_view_{mode}_1"] = slope_time(
            f, (cam0,), 10, 40, lambda o: int(o[1].counts[0]), a.trials)

    per_view = {k: (v / NV if k.endswith(f"b{NV}") and isinstance(v, float)
                    else None) for k, v in res.items()}
    print(f"{'stage':24s} {'ms':>9s} {'ms/view':>9s}")
    for k, v in res.items():
        if isinstance(v, float):
            pv = f"{per_view[k] * 1e3:9.3f}" if per_view.get(k) else " " * 9
            print(f"{k:24s} {v * 1e3:9.3f} {pv}")
        else:
            print(f"{k:24s} {v}")


if __name__ == "__main__":
    main()
