"""Benchmark: differentiable 2DGS rasterizer throughput at 512² on one chip.

Prints ONE JSON line: rendered frames/sec at 512² with the LaRa production
workload (524,288 candidate surfels — 64³ voxels × K=2, lightning/network.py:
306,325-326,334; BASELINE.json primary metric), measured at the REAL
training rasterizer config (RenderConfig defaults: dup=3, tile_budget=128,
visible-surfel compaction 163,840 — VERDICT r1 weak #2 asked for bench ==
train config).

Extra fields: fwd+bwd fps, the full fine train-step time at the reference
micro-batch (B=3, 4+4 views @512², flagship 125M model) and its MFU
(XLA cost-analysis FLOPs / measured time / 197 bf16-TFLOP/s v5e peak) —
VERDICT r1 item 8.

vs_baseline is measured against an estimated 250 fps for the reference CUDA
`diff-surfel-rasterization` forward on A100 at the same load (the reference
repo publishes no rasterizer-only numbers; 250 fps ≈ 4 ms/frame is a
favorable-to-the-baseline estimate for 2DGS ray-splat kernels at 512² with
~500k splats). Driver target: vs_baseline ≥ 2.0 (BASELINE.md).

Timing method: the axon backend's `block_until_ready` does not reliably
synchronize, and a single value fetch costs ~100+ ms through the remote
tunnel — so every measurement times two rep counts, each ended by a scalar
fetch, and reports the slope (t(R2)-t(R1))/(R2-R1).
"""

import json
import os
import time

import numpy as np

A100_BASELINE_FPS = 250.0
V5E_PEAK_FLOPS = 197e12  # bf16


def _slope_time(fn, args, r1, r2, fetch, trials=3):
    """Seconds per call via two-rep-count slope; `fetch(out)` must force.

    Best of `trials` slopes: the remote-tunnel backend shows ±3-20 %
    run-to-run jitter, and the minimum is the least-contended estimate."""
    out = fn(*args)
    fetch(out)  # warmup/compile

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


def lara_workload(n=64 ** 3 * 2, seed=0):
    """Surfel population statistically matching a *trained* LaRa scene:
    opacities polarized (surface surfels near-opaque, the rest transparent)
    and opaque surfels clustered on an object surface — the distribution the
    decoder converges to (opacity entropy collapses under the photometric
    loss), and the one the CUDA reference renders in its published setup.
    Scales around exp(scaling_shift) ≈ voxel/6."""
    import jax
    import jax.numpy as jnp

    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    # surface shell of radius ~0.28 with jitter + uniform transparent dust
    r3 = jax.random.normal(k[0], (n, 3))
    shell = 0.28 * r3 / jnp.linalg.norm(r3, axis=-1, keepdims=True)
    shell = shell + 0.01 * jax.random.normal(k[1], (n, 3))
    dust = jax.random.uniform(k[2], (n, 3), minval=-0.5, maxval=0.5)
    occupied = jax.random.uniform(k[3], (n,)) < 0.15
    means = jnp.where(occupied[:, None], shell, dust)
    shs = jax.random.normal(k[1], (n, 4, 3)) * 0.3
    op_raw = jnp.where(occupied, 3.0,
                       jax.random.uniform(k[4], (n,), minval=-9.0, maxval=-5.0))
    sc_raw = jnp.log(0.5 * (2.0 / 64) / 3.0) + jax.random.normal(k[5], (n, 2)) * 0.3
    quats = jax.random.normal(k[5], (n, 4))
    return means, shs, op_raw, sc_raw, quats


def bench_rasterizer():
    import jax
    import jax.numpy as jnp

    from lara_tpu.config import RenderConfig
    from lara_tpu.models.lara import make_cameras
    from lara_tpu.ops.rasterizer import RasterizeConfig
    from lara_tpu.ops.renderer import render_view

    H = W = 512
    r = RenderConfig()  # the PRODUCTION training defaults — what train.py runs
    cfg = RasterizeConfig(
        height=H, width=W, tile=r.tile, dup=r.dup, tile_budget=r.tile_budget,
        tile_chunk=r.tile_chunk, sh_degree=1,
        visible_budget=r.visible_budget,
        pallas_chunk=min(r.pallas_chunk, r.tile_budget),
        pallas_tiles_per_step=int(os.environ.get(
            "LARA_TILES_PER_STEP", r.pallas_tiles_per_step)),
        backend="pallas",
        bin_mode=os.environ.get("LARA_BIN_MODE", r.bin_mode),
        pack_mode=os.environ.get("LARA_PACK_MODE", r.pack_mode),
        # env vars override in BOTH directions; unset → RenderConfig default
        pallas_stash_carries={"1": True, "0": False}.get(
            os.environ.get("LARA_STASH", ""), r.pallas_stash_carries),
        pallas_cumsum=os.environ.get("LARA_CUMSUM", r.pallas_cumsum))

    means, shs, op_raw, sc_raw, quats = lara_workload()
    c2w = jnp.eye(4).at[2, 3].set(-1.8)
    cam = make_cameras(c2w, jnp.asarray(0.69), jnp.asarray(0.69),
                       jnp.asarray(1.0), jnp.asarray(2.6))
    bg = jnp.ones(3)

    @jax.jit
    def fwd(means, shs, op_raw, sc_raw, quats):
        return render_view(cam, None, means, shs, op_raw, sc_raw, quats, bg, cfg)["image"]

    @jax.jit
    def fwdbwd(means, shs, op_raw, sc_raw, quats):
        def loss(*args):
            f = render_view(cam, None, *args, bg, cfg)
            return jnp.mean(f["image"]) + jnp.mean(f["rend_dist"])
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(means, shs, op_raw, sc_raw, quats)

    args = (means, shs, op_raw, sc_raw, quats)
    t_fwd = _slope_time(fwd, args, 10, 40,
                        lambda o: float(jnp.sum(o[0, :2])))
    t_fb = _slope_time(fwdbwd, args, 5, 20,
                       lambda o: float(jnp.sum(o[0][0])))

    # max_radius truncation accounting (VERDICT r2 weak #7): fraction of
    # valid surfels whose unclamped footprint exceeds the dup-ring clamp.
    from lara_tpu.ops.rasterizer.preprocess import preprocess_surfels
    from lara_tpu.ops.renderer import (opacity_activation, rotation_activation,
                                       scaling_activation)

    @jax.jit
    def overflow_frac():
        _, ov = preprocess_surfels(
            means, shs, opacity_activation(op_raw), scaling_activation(sc_raw),
            rotation_activation(quats), cam, cfg, return_overflow=True)
        return ov

    overflow = float(overflow_frac())
    return 1.0 / t_fwd, 1.0 / t_fb, cfg, overflow


def analytic_flops_components(cfg, B: int, H: int, W: int):
    """Matmul-only FORWARD model FLOPs, per pipeline stage (dict). The
    formulas model the flax modules in lara_tpu/models/ exactly; a CPU
    cross-check against XLA cost-analysis at depth-1 (where scan bodies
    are counted exactly once — i.e. correctly) pins each one in
    tests/test_bench_flops.py, so the MFU denominator can't silently
    drift from the architecture it models."""
    m = cfg.model
    n_in = cfg.n_views
    n_views = 2 * n_in

    # ViT encoder over B·n_in images
    L = (H // m.patch_size) * (W // m.patch_size) + 1
    D = m.encoder_dim
    vit = m.encoder_depth * (24 * L * D * D + 4 * L * L * D)
    vit *= B * n_in
    # patch embed conv = one matmul over 3·p² inputs
    vit += B * n_in * 2 * (L - 1) * (3 * m.patch_size ** 2) * D

    # volume transformer: T tokens of dim E, per-group cross-attn over
    # n_in·block³ condition tokens of dim (encoder_dim + view_embed)
    R = m.vol_embedding_reso
    T = R ** 3
    E = m.embedding_dim
    block = R // m.n_groups[0]
    cond_tokens = (R // block) ** 3 * n_in * block ** 3
    cond_dim = m.encoder_dim + m.view_embed_dim
    per_layer = (
        4 * T * E * E                      # q + out proj
        + 4 * cond_tokens * cond_dim * E   # k + v proj
        + 4 * T * (n_in * block ** 3) * E  # qk + av inside each group
        + 8 * T * E * E                    # MLP ratio 2
        # 3³ conv residual, SAME padding: (3R−2)³ valid taps, not 27R³ —
        # padded-out taps are not model FLOPs (and XLA excludes them too)
        + 2 * (3 * R - 2) ** 3 * E * E
    )
    vol = m.num_layers * per_layer * B
    vol += B * 2 * 8 * T * E * m.vol_embedding_out_dim  # 2× deconv

    # coarse decoder over (2R)³ voxels: fc0 + fc1 (in→in) + out head
    M = (2 * R) ** 3
    out = 3 + (m.sh_degree + 1) ** 2 * 3 + 1 + 2 + 4
    dd = m.vol_embedding_out_dim
    dec = B * (2 * 2 * M * dd * dd + 2 * M * dd * out * m.K)

    # fine decoder over the fine budget: q+out proj, k+v proj over
    # n_in 8-dim point features, qk+av (q len 1), fc0 (dd→64), fc1 (64→sh)
    Mf = B * m.fine_budget
    sh_dim = (m.sh_degree + 1) ** 2 * 3
    fine = (4 * Mf * dd * dd + 4 * Mf * n_in * 8 * dd + 4 * Mf * n_in * dd
            + 2 * Mf * dd * 64 + 2 * Mf * 64 * sh_dim)

    # rasterizer blend: triangular-matmul cumsums, 2 render passes ×
    # B·n_views views, each ~num_tiles·(budget/chunk) chunk steps.
    # pallas_cumsum="shift" replaces the dots with shifted adds — zero
    # matmul FLOPs, so the blend term drops out of the MFU denominator.
    r = cfg.render
    if r.pallas_cumsum in ("shift", "prod"):
        blend = 0.0
    else:
        tiles = (H // r.tile) * (W // r.tile)
        chunks = tiles * max(1, r.tile_budget // r.pallas_chunk)
        # per chunk step: 4 triangular dots of [C,C]@[C,P], P = tile² pixels
        blend = ((2 * B * n_views) * chunks
                 * 4 * 2 * r.pallas_chunk ** 2 * r.tile ** 2)

    return {"vit": float(vit), "vol": float(vol), "dec": float(dec),
            "fine": float(fine), "blend": float(blend)}


def analytic_model_flops(cfg, B: int, H: int, W: int) -> float:
    """Matmul-only model FLOPs of ONE fine train step (fwd × 3 for
    fwd+bwd, the standard MFU convention — remat recompute deliberately
    EXCLUDED, so the number is comparable across remat policies).

    XLA's compiled cost_analysis undercounts heavily here (scan bodies are
    counted once, not per trip; Pallas kernels report zero), so MFU from
    it is meaningless — measured 5.35 TF/step vs ~20 TF analytic at the
    flagship shape. Covers the matmul-dominated stages: ViT encoder,
    volume transformer (cross-attn KV over grouped view tokens + MLP +
    3³ conv), upsampler, coarse/fine decoders, and the blend kernel's
    triangular-matmul cumsums. Gathers/elementwise excluded."""
    fwd = sum(analytic_flops_components(cfg, B, H, W).values())
    return 3.0 * fwd


def bench_train_step():
    """Full fine train step (model fwd + losses + AdamW) at the reference
    micro-batch B=3, 4 input + 4 supervision views, 512²."""
    import jax
    import jax.numpy as jnp

    from lara_tpu.config import Config, TrainConfig
    from lara_tpu.models import LaRaNet
    from lara_tpu.parallel.mesh import make_mesh, shard_batch
    from lara_tpu.train.state import TrainState, make_optimizer
    from lara_tpu.train.step import make_train_step
    from tests.test_model import synthetic_batch

    import dataclasses

    cfg = Config(n_views=4)
    # round-3 A/B levers for the flagship step (defaults = ModelConfig)
    m = cfg.model
    if os.environ.get("LARA_FLASH", "") == "1":
        m = dataclasses.replace(m, flash_attn=True)
    if os.environ.get("LARA_REMAT_POLICY", ""):
        m = dataclasses.replace(m, remat_policy=os.environ["LARA_REMAT_POLICY"])
    if os.environ.get("LARA_REMAT_SAVE") is not None:
        m = dataclasses.replace(
            m, remat_views_save=os.environ["LARA_REMAT_SAVE"])
    r = cfg.render
    if os.environ.get("LARA_BIN_MODE", ""):
        r = dataclasses.replace(r, bin_mode=os.environ["LARA_BIN_MODE"])
    if os.environ.get("LARA_PACK_MODE", ""):
        r = dataclasses.replace(r, pack_mode=os.environ["LARA_PACK_MODE"])
    if os.environ.get("LARA_STASH", "") in ("0", "1"):
        r = dataclasses.replace(
            r, pallas_stash_carries=os.environ["LARA_STASH"] == "1")
    if os.environ.get("LARA_CUMSUM", ""):
        r = dataclasses.replace(r, pallas_cumsum=os.environ["LARA_CUMSUM"])
    if m is not cfg.model or r is not cfg.render:
        cfg = dataclasses.replace(cfg, model=m, render=r)
    net = LaRaNet(cfg)
    B, H = 3, 512
    batch = synthetic_batch(B=B, n_views=cfg.n_views, H=H, W=H)
    params = jax.jit(lambda r: net.init(r, batch, with_fine=True,
                                        train=False))(jax.random.PRNGKey(0))
    mesh = make_mesh(n_dp=1, devices=jax.devices()[:1])
    tx, _ = make_optimizer(TrainConfig(grad_accum=1, warmup_iters=10), 1000)
    state = TrainState.create(apply_fn=net.apply, params=params, tx=tx)
    step = make_train_step(net, mesh, with_fine=True, grad_accum=1)
    sb = shard_batch(batch, mesh)

    flops = None
    try:
        lowered = jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__")
                          else step).lower(state, sb)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    holder = {"state": state}

    def one(sbatch):
        holder["state"], stats = step(holder["state"], sbatch)
        return stats

    t = _slope_time(one, (sb,), 2, 6, lambda s: float(s["loss"]))
    mfu = (flops / t / V5E_PEAK_FLOPS) if flops else None
    a_flops = analytic_model_flops(cfg, B, H, H)
    a_mfu = a_flops / t / V5E_PEAK_FLOPS
    return t, mfu, flops, a_mfu, a_flops


def bench_infer():
    """End-to-end inference (serving) throughput: full fine forward of the
    flagship model, B=1 scene, 4 input + 4 novel views at 512², EVAL
    rasterizer budgets — the evaluate.py hot loop. On by default so every
    round's BENCH records serving throughput (VERDICT r3 #5); set
    LARA_BENCH_INFER=0 to skip its extra multi-minute remote compile."""
    import jax

    from lara_tpu.config import Config
    from lara_tpu.models import LaRaNet
    from lara_tpu.train.step import make_forward
    from tests.test_model import synthetic_batch

    cfg = Config(n_views=4)
    net = LaRaNet(cfg)
    batch = synthetic_batch(B=1, n_views=cfg.n_views, H=512, W=512)
    params = jax.jit(lambda r: net.init(r, batch, with_fine=True,
                                        train=False))(jax.random.PRNGKey(0))
    fwd = make_forward(net, with_fine=True)
    t = _slope_time(fwd, (params, batch), 2, 6,
                    lambda o: float(o["image_fine"][0, 0, 0, 0, 0]))
    return t


def bench_input_pipeline():
    """Host loader scenes/sec at the production shape (gzip 512² HDF5,
    batch 3 × 8 views) — on by default so every round's BENCH records it
    (VERDICT r3 #6); LARA_BENCH_INPUT=0 skips the ~2 min of host-side
    shard generation + measurement.
    Worker count adapts to the host: on this container's single core,
    extra threads only contend (round-4 quiet-host sweep: 1 worker best),
    so we run min(cpu_count, 8) workers and report the per-host optimum.
    Round 5 moved gzip inflate to libdeflate via HDF5 direct-chunk reads
    (GIL released in C) and batched ray building into the native kernels:
    quiet single-core 3.53 scenes/s vs TPU consumption 1.15 = 3.1× margin
    (was 1.29 / 1.1×). Caveat: synthetic sphere images gzip smaller than
    real photos (real decode is somewhat slower)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
    from profile_input_pipeline import ensure_shard, measure

    # 16 scenes keeps one-time shard generation ~30 s on the 1-core host
    # (cached in /tmp thereafter); 3 epochs ≈ 30-40 s of measurement.
    path = ensure_shard("/tmp/lara_input_bench16_512.h5", 16, 512)
    workers = min(os.cpu_count() or 1, 8)
    return measure(path, workers=workers, batch=3, n_group=4, epochs=3)


def main():
    """Timeout-proof output discipline (VERDICT r4 item 1): print a COMPLETE
    JSON result line immediately after the rasterizer bench, then REPRINT it
    (a strict superset) after each later sub-bench completes. The driver
    parses the last JSON line of stdout, so a wall-clock kill at any point
    still leaves every number measured so far on the record. Each optional
    sub-bench is skipped with a `#` note when the remaining global budget
    (LARA_BENCH_DEADLINE_S, default 1200 s) can't plausibly cover it."""
    import jax

    t_start = time.perf_counter()
    deadline = float(os.environ.get("LARA_BENCH_DEADLINE_S", "1200"))

    def remaining():
        return deadline - (time.perf_counter() - t_start)

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lara_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    fwd_fps, fb_fps, cfg, radius_overflow = bench_rasterizer()

    extra = {
        "fwd_bwd_fps": round(fb_fps, 2),
        "radius_overflow_frac": round(radius_overflow, 5),
        "device": str(jax.devices()[0]),
        "raster_config": {
            "dup": cfg.dup, "tile_budget": cfg.tile_budget,
            "visible_budget": cfg.visible_budget,
            "pallas_chunk": cfg.pallas_chunk,
            "tiles_per_step": cfg.pallas_tiles_per_step,
            "bin_mode": cfg.bin_mode,
            "pack_mode": cfg.pack_mode,
            "stash_carries": cfg.pallas_stash_carries,
            "cumsum": cfg.pallas_cumsum},
    }
    for env in ("LARA_FLASH", "LARA_REMAT_POLICY"):
        if os.environ.get(env):
            extra[env.lower()] = os.environ[env]

    def emit():
        print(json.dumps({
            "metric": "render_fps_512_524k_surfels",
            "value": round(fwd_fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fwd_fps / A100_BASELINE_FPS, 3),
            "extra": extra,
        }), flush=True)

    emit()  # primary numbers are on the record from here on

    # (sub-bench, env gate, rough wall cost incl. compile, runner)
    def run_train():
        train_step_s, mfu, flops, a_mfu, a_flops = bench_train_step()
        extra["train_step_s"] = round(train_step_s, 3)
        extra["train_scenes_per_sec"] = round(3.0 / train_step_s, 3)
        if mfu is not None:
            extra["train_mfu_xla"] = round(mfu, 4)
            extra["train_step_tflops_xla"] = round(flops / 1e12, 2)
        # analytic matmul-model FLOPs (3x fwd, no remat recompute) — the
        # honest MFU; XLA cost analysis undercounts scan/Pallas bodies
        extra["train_mfu"] = round(a_mfu, 4)
        extra["train_step_tflops_analytic"] = round(a_flops / 1e12, 2)

    def run_infer():
        infer_s = bench_infer()
        extra["infer_scene_s"] = round(infer_s, 3)
        extra["infer_scenes_per_sec"] = round(1.0 / infer_s, 3)

    def run_input():
        extra["input_scenes_per_sec"] = round(bench_input_pipeline(), 2)

    stages = [
        ("train-step", "LARA_BENCH_TRAIN", 420.0, run_train),
        ("infer", "LARA_BENCH_INFER", 300.0, run_infer),
        ("input-pipeline", "LARA_BENCH_INPUT", 240.0, run_input),
    ]
    for name, env, est_s, runner in stages:
        if os.environ.get(env, "1") == "0":
            continue
        if remaining() < est_s:
            print(f"# {name} bench skipped: {remaining():.0f}s left "
                  f"< {est_s:.0f}s estimate (LARA_BENCH_DEADLINE_S)",
                  flush=True)
            continue
        try:
            runner()
        except Exception as e:  # report everything measured so far regardless
            print(f"# {name} bench failed: {type(e).__name__}: {e}",
                  flush=True)
        emit()


if __name__ == "__main__":
    main()
