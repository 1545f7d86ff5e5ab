"""Decompose the rasterizer's non-blend backward at the production config.

tools/profile_rasterizer.py showed (r4, TPU v5e): FULL fwd 8.4 ms,
FULL fwd+bwd 24.3 ms, blend-only fwd+bwd 9.9 ms, chain(no blend) fwd+bwd
11.7 ms — so ~7 ms of backward lives OUTSIDE the Pallas blend kernel.
This script times each candidate contributor in isolation so the next
optimization targets the measured cost, not a guess:

  - window-gather transpose (scatter-add of [T,K,13] cotangents into [V,13])
  - pack/take_rows transpose (masked inverse-permutation gather to [N,13])
  - preprocess backward (elementwise over N surfels)
  - full chain minus each stage

Run: python tools/profile_chain_bwd.py
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/lara_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import lara_workload
    from lara_tpu.config import RenderConfig
    from lara_tpu.models.lara import make_cameras
    from lara_tpu.ops.gather import take_rows
    from lara_tpu.ops.rasterizer import RasterizeConfig
    from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels
    from lara_tpu.ops.rasterizer.tiled import bin_view, pack_surfels

    H = W = 512
    r = RenderConfig()
    cfg = RasterizeConfig(
        height=H, width=W, tile=r.tile, dup=r.dup, tile_budget=r.tile_budget,
        tile_chunk=r.tile_chunk, sh_degree=1,
        visible_budget=r.visible_budget,
        pallas_chunk=min(r.pallas_chunk, r.tile_budget),
        pallas_tiles_per_step=r.pallas_tiles_per_step, backend="pallas")

    means, shs, op_raw, sc_raw, quats = lara_workload()
    c2w = jnp.eye(4).at[2, 3].set(-1.8)
    cam = make_cameras(c2w, jnp.asarray(0.69), jnp.asarray(0.69),
                       jnp.asarray(1.0), jnp.asarray(2.6))
    prm = (means, shs, op_raw, sc_raw, quats)

    def act(means, shs, op_raw, sc_raw, quats):
        return (means, shs, jax.nn.sigmoid(op_raw), jnp.exp(sc_raw),
                quats / jnp.linalg.norm(quats, axis=-1, keepdims=True))

    # Stage snapshots (forward only, fixed)
    @jax.jit
    def stages(*p):
        m, s, o, sc, q = act(*p)
        g = preprocess_surfels(m, s, o, sc, q, cam, cfg)
        packed, b = bin_view(g, cfg)
        return packed, b.win_gidx, b.order_v, b.inv_order

    packed, win_gidx, order_v, inv_order = jax.block_until_ready(stages(*prm))

    rows = [
        # 1. preprocess-only backward (elementwise over N)
        ("pre bwd", jax.jit(lambda *p: jax.grad(
            lambda *a: jnp.sum(jnp.square(pack_surfels(preprocess_surfels(
                *act(*a), cam, cfg)))), argnums=(0, 1, 2, 3, 4))(*p)),
         prm, lambda o: float(o[0][0, 0])),
        # 2. pre + pack/take_rows backward (adds the compaction transpose)
        ("pre+pack bwd", jax.jit(lambda *p: jax.grad(
            lambda *a: jnp.sum(jnp.square(take_rows(
                pack_surfels(preprocess_surfels(*act(*a), cam, cfg)),
                order_v, inv_order))), argnums=(0, 1, 2, 3, 4))(*p)),
         prm, lambda o: float(o[0][0, 0])),
        # 3. window-gather transpose alone, packed fixed input
        ("wg bwd only", jax.jit(lambda pk: jax.grad(
            lambda p: jnp.sum(jnp.square(p[win_gidx])))(pk)),
         (packed,), lambda o: float(o[0, 0])),
        # 4. pre+pack+window backward = the full chain
        ("full chain bwd", jax.jit(lambda *p: jax.grad(
            lambda *a: jnp.sum(jnp.square(take_rows(
                pack_surfels(preprocess_surfels(*act(*a), cam, cfg)),
                order_v, inv_order)[win_gidx])),
            argnums=(0, 1, 2, 3, 4))(*p)),
         prm, lambda o: float(o[0][0, 0])),
        # 5. chain incl. live binning (indices recomputed in fwd like prod)
        ("chain live-bin bwd", jax.jit(lambda *p: jax.grad(
            lambda *a: (lambda g: (lambda pb: jnp.sum(
                jnp.square(pb[0][pb[1].win_gidx])))(bin_view(g, cfg)))(
                    preprocess_surfels(*act(*a), cam, cfg)),
            argnums=(0, 1, 2, 3, 4))(*p)),
         prm, lambda o: float(o[0][0, 0])),
    ]
    for name, fn, a, fetch in rows:
        t = slope_time(fn, a, 5, 20, fetch)
        print(f"{name:22s} {t * 1e3:8.2f} ms   {1.0 / t:8.1f} /s", flush=True)


if __name__ == "__main__":
    main()
