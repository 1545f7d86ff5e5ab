"""Pin bench.py's analytic MFU denominator to the real architecture.

`bench.analytic_flops_components` is the headline MFU denominator (VERDICT
r4 weak #4 / item 8): it hand-counts the matmul FLOPs of every pipeline
stage because XLA's compiled cost-analysis counts scan bodies once (not per
trip) and Pallas kernels as zero. These tests cross-check each component
formula against XLA cost-analysis ON SHAPES WHERE XLA'S COUNT IS EXACT —
depth-1 stacks (a length-1 scan body is counted exactly once, which is the
right answer) with remat off, flash off, and sequence lengths below the
q-chunk threshold (no lax.map in the attention). If the flax modules in
lara_tpu/models/ gain or lose a matmul, these bounds break.

XLA counts a superset (elementwise, layernorm, softmax mixing) of the
matmul-only analytic model, so the contract is: analytic ≤ xla ≤
analytic × (1 + SLACK), with dims chosen large enough that matmuls
dominate the elementwise overhead.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

import bench
from lara_tpu.config import Config, ModelConfig

SLACK = 0.30  # non-matmul ops must stay under 30% at these dims


def _xla_flops(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def _check(name, analytic, xla):
    assert analytic <= xla * 1.02, (
        f"{name}: analytic {analytic:.3e} EXCEEDS xla {xla:.3e} — the "
        f"formula counts matmuls the model doesn't have")
    assert xla <= analytic * (1.0 + SLACK), (
        f"{name}: xla {xla:.3e} > analytic {analytic:.3e} + {SLACK:.0%} — "
        f"the model gained matmuls the formula doesn't count")


def test_vit_component():
    from lara_tpu.models.vit import DinoViT

    B, n_in, H = 1, 2, 128
    dim, depth, heads = 256, 1, 4
    cfg = Config(
        n_views=n_in,
        model=dataclasses.replace(ModelConfig(), encoder_dim=dim,
                                  encoder_depth=depth, encoder_heads=heads,
                                  remat=False, flash_attn=False))
    analytic = bench.analytic_flops_components(cfg, B, H, H)["vit"]

    net = DinoViT(patch_size=16, dim=dim, depth=depth, num_heads=heads,
                  remat=False, use_flash=False)
    x = jnp.zeros((B * n_in, H, H, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    xla = _xla_flops(lambda p, a: net.apply(p, a), params, x)
    _check("vit", analytic, xla)


def test_vol_component():
    from lara_tpu.models.volume import VolTransformer

    B, n_in = 1, 2
    R, E, out = 8, 256, 40
    enc_dim, ve_dim = 248, 8   # cond dim = encoder_dim + view_embed_dim
    cfg = Config(
        n_views=n_in,
        model=dataclasses.replace(
            ModelConfig(), encoder_dim=enc_dim, view_embed_dim=ve_dim,
            embedding_dim=E, vol_embedding_reso=R, vol_embedding_out_dim=out,
            num_layers=1, num_heads=4, n_groups=(R // 2,), remat=False))
    analytic = bench.analytic_flops_components(cfg, B, 512, 512)["vol"]

    net = VolTransformer(embed_dim=E, image_feat_dim=enc_dim + ve_dim,
                         vol_low_res=R, out_dim=out, n_groups=(R // 2,),
                         num_layers=1, num_heads=4, remat=False)
    feats = jnp.zeros((B, n_in, R, R, R, enc_dim + ve_dim), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), feats)
    xla = _xla_flops(lambda p, a: net.apply(p, a), params, feats)
    _check("vol", analytic, xla)


def test_coarse_decoder_component():
    from lara_tpu.models.decoder import CoarseDecoder

    B, R, dd, K, sh_degree = 1, 8, 80, 2, 1
    sh_dim = (sh_degree + 1) ** 2 * 3
    cfg = Config(
        n_views=2,
        model=dataclasses.replace(
            ModelConfig(), vol_embedding_reso=R, vol_embedding_out_dim=dd,
            K=K, sh_degree=sh_degree, n_groups=(R // 2,)))
    analytic = bench.analytic_flops_components(cfg, B, 512, 512)["dec"]

    net = CoarseDecoder(in_dim=dd, sh_dim=sh_dim, K=K)
    feats = jnp.zeros((B, (2 * R) ** 3, dd), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), feats, 0.0, 0.0)
    xla = _xla_flops(lambda p, a: net.apply(p, a, -2.0, -3.0), params, feats)
    _check("dec", analytic, xla)


def test_fine_decoder_component():
    from lara_tpu.models.decoder import FineDecoder

    B, n_in, dd, sh_degree, budget = 1, 4, 80, 1, 4096
    sh_dim = (sh_degree + 1) ** 2 * 3
    cfg = Config(
        n_views=n_in,
        model=dataclasses.replace(
            ModelConfig(), vol_embedding_out_dim=dd, sh_degree=sh_degree,
            fine_budget=budget))
    analytic = bench.analytic_flops_components(cfg, B, 512, 512)["fine"]

    net = FineDecoder(in_dim=dd, sh_dim=sh_dim)
    vol = jnp.zeros((B * budget, dd), jnp.float32)
    pf = jnp.zeros((B * budget, n_in, 8), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), vol, pf)
    xla = _xla_flops(lambda p, a, b: net.apply(p, a, b), params, vol, pf)
    _check("fine", analytic, xla)


def test_blend_component_counts_kernel_dots():
    """The blend formula models the Pallas kernel's 4 triangular [C,C]@[C,P]
    dots per chunk step × chunks × 2 passes × B·2n views (dot mode), and
    drops to zero in shift mode (no MXU dots in the kernel). Cross-check
    against a direct recount from the kernel constants (pallas_blend.py
    _chunk_fn: l_incl cumsum + 3 l_excl moment dots)."""
    cfg = Config(n_views=4)
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, pallas_cumsum="dot"))
    B, H = 3, 512
    r = cfg.render
    comps = bench.analytic_flops_components(cfg, B, H, H)
    tiles = (H // r.tile) ** 2
    chunk_steps = tiles * (r.tile_budget // r.pallas_chunk)
    per_dot = 2 * r.pallas_chunk ** 2 * r.tile ** 2
    expect = 2 * B * 2 * cfg.n_views * chunk_steps * 4 * per_dot
    assert comps["blend"] == pytest.approx(expect, rel=1e-9)

    for mode in ("shift", "prod"):   # no MXU dots in either scan mode
        mcfg = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, pallas_cumsum=mode))
        assert bench.analytic_flops_components(mcfg, B, H, H)["blend"] == 0.0


def test_total_is_3x_forward_sum():
    cfg = Config(n_views=4)
    comps = bench.analytic_flops_components(cfg, 3, 512, 512)
    total = bench.analytic_model_flops(cfg, 3, 512, 512)
    assert total == pytest.approx(3.0 * sum(comps.values()), rel=1e-12)
