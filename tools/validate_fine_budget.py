"""Validate the static fine-stage budget against the reference's dynamic mask.

The reference's fine stage renders ALL surfels with coarse opacity > 0.005
(lightning/network.py:381-388,504-511 — a dynamic boolean mask, up to 262k
surfels); our TPU design keeps shapes static with a top-`fine_budget`
selection by opacity (models/lara.py _fine_stage). VERDICT r1 weak #4 asked
for the quality delta to be measured, not assumed.

This tool renders the trained-scene-statistics workload (bench.lara_workload,
the same opacity/scale distribution the decoder converges to) with:
  (a) the reference behavior — every surfel with opacity > 0.005 kept;
  (b) top-M by opacity for M ∈ {49152, 65536, 98304, 131072, 262144};
and reports the census of (a) plus PSNR of each (b) against (a).

Run: python tools/validate_fine_budget.py
"""

import json
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lara_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import lara_workload
    from lara_tpu.config import RenderConfig
    from lara_tpu.models.lara import make_cameras
    from lara_tpu.ops.rasterizer import RasterizeConfig
    from lara_tpu.ops.renderer import render_view

    H = W = 512
    r = RenderConfig()
    cfg = RasterizeConfig(
        height=H, width=W, tile=r.tile, dup=r.dup,
        tile_budget=r.eval_tile_budget, tile_chunk=r.tile_chunk, sh_degree=1,
        visible_budget=0,  # reference render: nothing truncated
        pallas_chunk=min(r.pallas_chunk, r.eval_tile_budget),
        pallas_tiles_per_step=r.pallas_tiles_per_step, backend="pallas")

    means, shs, op_raw, sc_raw, quats = lara_workload()
    n = means.shape[0]
    bg = jnp.ones(3)

    op_act = jax.nn.sigmoid(op_raw)
    census = int(jnp.sum(op_act > 0.005))

    @jax.jit
    def render(op_raw_in, c2w):
        cam = make_cameras(c2w, jnp.asarray(0.69), jnp.asarray(0.69),
                           jnp.asarray(1.0), jnp.asarray(2.6))
        return render_view(cam, None, means, shs, op_raw_in, sc_raw, quats,
                           bg, cfg)["image"]

    # reference behavior: surfels at/below the 0.005 threshold dropped
    op_ref = jnp.where(op_act > 0.005, op_raw, -1e4)

    # three orbit views so the number isn't a single-view fluke
    c2ws = []
    for ang in (0.0, 2.1, 4.2):
        c, s = jnp.cos(ang), jnp.sin(ang)
        rot = jnp.asarray([[c, 0, s, 0], [0, 1, 0, 0],
                           [-s, 0, c, 0], [0, 0, 0, 1]], jnp.float32)
        c2ws.append(rot.at[2, 3].set(-1.8))

    refs = [render(op_ref, c2w) for c2w in c2ws]

    score = jnp.where(op_act > 0.005, op_act, -1.0)
    results = {"census_op_gt_0.005": census, "n_candidates": n, "budgets": {}}
    for m in (49152, 65536, 98304, 131072, 262144):
        _, idx = jax.lax.top_k(score, m)
        keep = jnp.zeros((n,), bool).at[idx].set(True)
        op_m = jnp.where(keep & (op_act > 0.005), op_raw, -1e4)
        psnrs = []
        for ref, c2w in zip(refs, c2ws):
            img = render(op_m, c2w)
            mse = jnp.mean((img - ref) ** 2)
            psnr = float(jnp.where(
                mse < 1e-12, jnp.inf,
                -10.0 * jnp.log(mse) / jnp.log(jnp.asarray(10.0))))
            psnrs.append(round(psnr, 2))
        results["budgets"][m] = {
            "psnr_vs_reference_mask": psnrs,
            "kept_fraction_of_census": round(min(m, census) / census, 3),
        }
        print(f"M={m:7d}: psnr vs dynamic mask {psnrs}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
