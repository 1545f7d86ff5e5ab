"""Validate the static fine-stage surfel budget (VERDICT r1 weak #4).

The reference's fine stage renders ALL surfels with opacity > 0.005, thinned
only above 50% occupancy (lightning/network.py:381-388,504-511); our TPU
formulation keeps the top `fine_budget` by opacity (static shapes). This
tool measures, on the trained-statistics bench workload:
  - the census of opacity>0.005 surfels (what the reference would render),
  - PSNR of the top-M render against the all-active render for a sweep of M,
so the default budget is justified by a number (docs/status_round2.md).
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main(budgets=(32768, 65536, 98304, 131072, 262144)):
    import jax
    import jax.numpy as jnp

    from bench import lara_workload
    from lara_tpu.models.lara import make_cameras
    from lara_tpu.ops.rasterizer import RasterizeConfig
    from lara_tpu.ops.renderer import render_view

    H = W = 512
    means, shs, op_raw, sc_raw, quats = lara_workload()
    n = means.shape[0]
    cam = make_cameras(jnp.eye(4).at[2, 3].set(-1.8), jnp.asarray(0.69),
                       jnp.asarray(0.69), jnp.asarray(1.0), jnp.asarray(2.6))
    bg = jnp.ones(3)

    op_act = jax.nn.sigmoid(op_raw)
    census = int(jnp.sum(op_act > 0.005))
    print(f"census opacity>0.005: {census} / {n} ({100*census/n:.1f}%)")

    def render(op_masked_raw, budget):
        cfg = RasterizeConfig(height=H, width=W, tile=16, dup=3,
                              tile_budget=256, tile_chunk=32, sh_degree=1,
                              visible_budget=0, pallas_chunk=64,
                              pallas_tiles_per_step=4, backend="pallas")
        f = jax.jit(lambda *a: render_view(cam, None, *a, bg, cfg)["image"])
        img = f(means, shs, op_masked_raw, sc_raw, quats)
        return np.asarray(img)

    # reference behavior: every surfel with opacity > 0.005 active
    ref_raw = jnp.where(op_act > 0.005, op_raw, -1e4)
    ref_img = render(ref_raw, None)

    score = jnp.where(op_act > 0.005, op_act, -1.0)
    order = jnp.argsort(-score)
    for M in budgets:
        keep = jnp.zeros((n,), bool).at[order[:M]].set(True)
        img = render(jnp.where(keep & (op_act > 0.005), op_raw, -1e4), M)
        mse = float(np.mean((img - ref_img) ** 2))
        psnr = float("inf") if mse == 0 else -10 * np.log10(mse)
        print(f"fine_budget {M:7d}: PSNR vs all-active = {psnr:6.2f} dB "
              f"({min(M, census)}/{census} active kept)")


if __name__ == "__main__":
    main()
