"""Stage-level rasterizer profiling on the real chip (round-2 perf work).

Times each pipeline stage of the pallas backend at the production training
config so optimization targets the measured budget, not guesses.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import lara_workload  # noqa: E402
from lara_tpu.config import RenderConfig  # noqa: E402
from lara_tpu.models.lara import make_cameras  # noqa: E402
from lara_tpu.ops.rasterizer import RasterizeConfig  # noqa: E402
from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels  # noqa: E402
from lara_tpu.ops.rasterizer.tiled import bin_surfels  # noqa: E402
from lara_tpu.ops.rasterizer.pallas_blend import blend_tiles_pallas  # noqa: E402
from lara_tpu.ops.renderer import render_view  # noqa: E402


def timeit(fn, args, reps=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main(dup=3, budget=128, visible=0, chunk=32, tpg=4):
    H = W = 512
    cfg = RasterizeConfig(height=H, width=W, tile=16, dup=dup,
                          tile_budget=budget, tile_chunk=32, sh_degree=1,
                          visible_budget=visible, pallas_chunk=chunk,
                          pallas_tiles_per_step=tpg, backend="pallas")
    means, shs, op_raw, sc_raw, quats = lara_workload()
    c2w = jnp.eye(4).at[2, 3].set(-1.8)
    cam = make_cameras(c2w, jnp.asarray(0.69), jnp.asarray(0.69),
                       jnp.asarray(1.0), jnp.asarray(2.6))
    bg = jnp.ones(3)
    print(f"config: dup={dup} budget={budget} N={means.shape[0]}")

    from lara_tpu.ops.renderer import (opacity_activation, rotation_activation,
                                       scaling_activation)
    opacity = opacity_activation(op_raw)
    scales = scaling_activation(sc_raw)
    rotations = rotation_activation(quats)

    pre = jax.jit(lambda *a: preprocess_surfels(*a, cam, cfg))
    g = pre(means, shs, opacity, scales, rotations)
    timeit(pre, (means, shs, opacity, scales, rotations), name="preprocess")

    nvis = int(jnp.sum(g.valid))
    print(f"{'visible surfels':42s} {nvis:8d}  ({100*nvis/means.shape[0]:.1f}%)")

    binf = jax.jit(lambda gg: bin_surfels(gg, cfg))
    packed, win_gidx, entry_valid, counts = binf(g)
    timeit(binf, (g,), name="bin_surfels (sort+windows)")
    print(f"{'mean/max tile count':42s} "
          f"{float(jnp.mean(counts)):8.1f} / {int(jnp.max(counts))}")

    gather = jax.jit(lambda p, w: p[w])
    timeit(gather, (packed, win_gidx), name="window gather [T,K,13]")

    entries = gather(packed, win_gidx)
    scalars = jnp.stack([jnp.asarray(cam.tanfovx, jnp.float32).reshape(()),
                         jnp.asarray(cam.tanfovy, jnp.float32).reshape(())])
    blend = jax.jit(lambda e, c, s: blend_tiles_pallas(e, c, s, cfg))
    timeit(blend, (entries, counts, scalars), name="pallas blend fwd")

    blend_bwd = jax.jit(lambda e, c, s: jax.grad(
        lambda ee: jnp.sum(blend_tiles_pallas(ee, c, s, cfg)))(e))
    timeit(blend_bwd, (entries, counts, scalars), name="pallas blend fwd+bwd")

    # scatter-add: transpose of the window gather
    scat = jax.jit(lambda w, d: jnp.zeros_like(packed).at[w].add(d))
    d_entries = jnp.ones_like(entries)
    timeit(scat, (win_gidx, d_entries), name="scatter-add d_entries -> d_packed")

    fwd = jax.jit(lambda *a: render_view(cam, None, *a, bg, cfg)["image"])
    timeit(fwd, (means, shs, op_raw, sc_raw, quats), name="FULL fwd (render_view)")

    def loss(*a):
        f = render_view(cam, None, *a, bg, cfg)
        return jnp.mean(f["image"]) + jnp.mean(f["rend_dist"])

    fb = jax.jit(lambda *a: jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*a))
    timeit(fb, (means, shs, op_raw, sc_raw, quats), name="FULL fwd+bwd")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--dup", type=int, default=3)
    p.add_argument("--budget", type=int, default=128)
    p.add_argument("--visible", type=int, default=0)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--tpg", type=int, default=4)
    a = p.parse_args()
    main(a.dup, a.budget, a.visible, a.chunk, a.tpg)
