#!/usr/bin/env python
"""Bisect the pallas_batch_tiles Mosaic compile failure on real TPU.

Round-4 A/B found every batch_tiles combination fails TPU compilation
(HTTP 500 from the remote compile helper) while interpret-mode parity
passes. This compiles each batched kernel in isolation at the production
tile shape, then progressively simplified variants, printing the first
real Mosaic error text so the kernel can be fixed rather than abandoned.

Usage: python tools/debug_batch_tiles.py [--tiles 8] [--tpg 4]
"""

import argparse
import sys
import traceback

sys.path.insert(0, ".")

from lara_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--tpg", type=int, default=4)
    ap.add_argument("--only", default=None)
    a = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lara_jax_cache")

    from lara_tpu.ops.rasterizer import RasterizeConfig
    from lara_tpu.ops.rasterizer import pallas_blend as pb

    cfg = RasterizeConfig(
        height=16 * a.tiles, width=16, tile=16, dup=3, tile_budget=128,
        pallas_chunk=64, pallas_tiles_per_step=a.tpg, backend="pallas",
        pallas_batch_tiles=True, visible_budget=0)
    t_tiles = cfg.num_tiles
    k = jax.random.PRNGKey(0)
    entries = jax.random.normal(k, (t_tiles, cfg.tile_budget, pb.PACK_COLS),
                                jnp.float32)
    counts = jnp.full((t_tiles,), 100, jnp.int32)
    scalars = jnp.asarray([0.7, 0.7], jnp.float32)
    cot = jnp.ones((t_tiles, pb.NUM_CHANNELS, cfg.tile * cfg.tile), jnp.float32)

    def attempt(name, fn):
        if a.only and a.only != name:
            return
        print(f"--- {name}", flush=True)
        try:
            out = fn()
            jax.block_until_ready(out)
            r = out[0] if isinstance(out, (tuple, list)) else out
            print(f"OK {name}: {jax.tree.map(lambda x: x.shape, r)}", flush=True)
        except Exception as e:
            msg = str(e)
            print(f"FAIL {name}: {type(e).__name__}: {msg[:2000]}", flush=True)
            tb = traceback.format_exc()
            print(tb[-1500:], flush=True)

    attempt("fwd_batched", lambda: jax.jit(
        lambda e, c, s: pb._run_fwd(e, c, s, cfg))(entries, counts, scalars))
    attempt("fwd_batched_stash", lambda: jax.jit(
        lambda e, c, s: pb._run_fwd(e, c, s, cfg, stash=True))(
            entries, counts, scalars))
    attempt("bwd_batched", lambda: jax.jit(
        lambda e, c, s, ct: pb._run_bwd(e, c, s, ct, cfg))(
            entries, counts, scalars, cot))

    def bwd_stash():
        acc, carries = pb._run_fwd(entries, counts, scalars, cfg, stash=True)
        ndone = acc[:, pb.NUM_CHANNELS, 0].astype(jnp.int32)
        return pb._run_bwd_stash(entries, counts, ndone, scalars, carries,
                                 cot, cfg)

    attempt("bwd_batched_stash", lambda: jax.jit(bwd_stash)())

    # control: the same shapes with batching off must compile
    cfg_nb = dataclasses.replace(cfg, pallas_batch_tiles=False)
    attempt("fwd_unbatched_control", lambda: jax.jit(
        lambda e, c, s: pb._run_fwd(e, c, s, cfg_nb))(entries, counts, scalars))


if __name__ == "__main__":
    main()
