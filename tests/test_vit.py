"""ViT encoder: shapes, pos-embed resampling, timm-converter structure."""

import jax
import jax.numpy as jnp
import numpy as np

from lara_tpu.models.vit import DinoViT, convert_timm_state_dict


def small_vit(**kw):
    return DinoViT(patch_size=16, dim=32, depth=2, num_heads=4,
                   native_grid=4, dtype=jnp.float32, **kw)


def test_forward_shapes_and_dynamic_size():
    vit = small_vit()
    imgs64 = jnp.zeros((2, 64, 64, 3))
    params = vit.init(jax.random.PRNGKey(0), imgs64)
    out = vit.apply(params, imgs64)
    assert out.shape == (2, 16, 32)  # 4x4 tokens, CLS dropped
    # dynamic image size: same params, larger input → resampled pos-embed
    out2 = vit.apply(params, jnp.zeros((1, 128, 128, 3)))
    assert out2.shape == (1, 64, 32)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_imagenet_normalization_applied():
    vit = small_vit()
    imgs = jnp.ones((1, 64, 64, 3)) * 0.5
    params = vit.init(jax.random.PRNGKey(0), imgs)
    a = vit.apply(params, imgs)
    b = vit.apply(params, imgs * 0.0)
    # different inputs must produce different tokens (normalization is
    # affine, not collapsing)
    assert float(jnp.abs(a - b).max()) > 1e-4


def _fake_timm_state(depth=2, dim=32, grid=4):
    rng = np.random.default_rng(0)
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(dim, 3, 16, 16)).astype(np.float32),
        "patch_embed.proj.bias": rng.normal(size=(dim,)).astype(np.float32),
        "cls_token": rng.normal(size=(1, 1, dim)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, grid * grid + 1, dim)).astype(np.float32),
        "norm.weight": np.ones(dim, np.float32),
        "norm.bias": np.zeros(dim, np.float32),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = np.ones(dim, np.float32)
        sd[p + "norm1.bias"] = np.zeros(dim, np.float32)
        sd[p + "attn.qkv.weight"] = rng.normal(size=(3 * dim, dim)).astype(np.float32)
        sd[p + "attn.qkv.bias"] = rng.normal(size=(3 * dim,)).astype(np.float32)
        sd[p + "attn.proj.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
        sd[p + "attn.proj.bias"] = rng.normal(size=(dim,)).astype(np.float32)
        sd[p + "norm2.weight"] = np.ones(dim, np.float32)
        sd[p + "norm2.bias"] = np.zeros(dim, np.float32)
        sd[p + "mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim)).astype(np.float32)
        sd[p + "mlp.fc1.bias"] = rng.normal(size=(4 * dim,)).astype(np.float32)
        sd[p + "mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim)).astype(np.float32)
        sd[p + "mlp.fc2.bias"] = rng.normal(size=(dim,)).astype(np.float32)
    return sd


def test_timm_converter_structure_matches_init():
    vit = small_vit()
    imgs = jnp.zeros((1, 64, 64, 3))
    init_params = vit.init(jax.random.PRNGKey(0), imgs)["params"]
    converted = convert_timm_state_dict(_fake_timm_state(), depth=2)

    init_flat = jax.tree.leaves_with_path(init_params)
    conv_flat = jax.tree.leaves_with_path(converted)
    init_map = {jax.tree_util.keystr(k): v.shape for k, v in init_flat}
    conv_map = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in conv_flat}
    assert init_map == conv_map

    # converted params actually run
    out = vit.apply({"params": converted}, imgs)
    assert out.shape == (1, 16, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_torch_bicubic_matrix_exact():
    """torch_bicubic_matrix must reproduce F.interpolate(mode="bicubic",
    align_corners=False) bit-for-bit (to f32 rounding) — the resampler timm
    applies to pretrained pos-embeds under dynamic_img_size. jax.image's
    Keys a=-0.5 kernel measured max|Δ|≈0.4 on the 14→32 DINO grid, which
    is why the ViT uses these matrices instead (VERDICT r3 item 7)."""
    import torch
    import torch.nn.functional as F

    from lara_tpu.models.vit import resample_pos_embed, torch_bicubic_matrix

    rng = np.random.default_rng(1)
    for n_in, n_out in [(14, 32), (14, 16), (14, 8), (7, 14), (4, 4)]:
        x = rng.normal(size=(1, n_in, n_in, 24)).astype(np.float32)
        want = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(n_out, n_out),
            mode="bicubic", align_corners=False).permute(0, 2, 3, 1).numpy()
        m = torch_bicubic_matrix(n_in, n_out)
        got = np.einsum("oh,bhwd->bowd", m, x)
        got = np.einsum("ow,bhwd->bhod", m, got)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
        got_j = np.asarray(resample_pos_embed(jnp.asarray(x), n_out, n_out))
        np.testing.assert_allclose(got_j, want, atol=2e-5, rtol=1e-5)


def test_vitb_real_dims_converter_parity():
    """Converter fidelity at the REAL timm architecture shape (VERDICT r3
    item 7): a full ViT-B/16 torch twin (768 dim, 12 layers, 12 heads, timm
    naming — the exact state-dict layout `vit_base_patch16_224.dino` ships)
    crosses over through convert_timm_state_dict and must match our flax
    encoder to ≤1e-3 at the native 224² grid AND at a resampled 128² grid
    (exercising the torch-exact pos-embed bicubic end-to-end)."""
    import torch

    from tests.test_parity_e2e import TorchTimmViT
    from lara_tpu.models.vit import IMAGENET_MEAN, IMAGENET_STD

    torch.manual_seed(0)
    twin = TorchTimmViT(768, 12, 12).eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params = convert_timm_state_dict(sd, depth=12)

    vit = DinoViT(dim=768, depth=12, num_heads=12, native_grid=14,
                  dtype=jnp.float32, remat=False)
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(1, 224, 224, 3)).astype(np.float32)

    mean = np.array(IMAGENET_MEAN, np.float32)
    std = np.array(IMAGENET_STD, np.float32)
    t_in = torch.from_numpy(((img - mean) / std).transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        want = twin(t_in).numpy()
    got = np.asarray(vit.apply({"params": params}, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)

    # resampled grid: torch side resamples the pos-embed the timm way
    img2 = rng.uniform(size=(1, 128, 128, 3)).astype(np.float32)
    import torch.nn.functional as F

    pos = twin.pos_embed.detach()
    pos_cls, pos_grid = pos[:, :1], pos[:, 1:].reshape(1, 14, 14, 768)
    pos_rs = F.interpolate(pos_grid.permute(0, 3, 1, 2), size=(8, 8),
                           mode="bicubic", align_corners=False)
    pos_rs = pos_rs.permute(0, 2, 3, 1).reshape(1, 64, 768)
    t_in2 = torch.from_numpy(((img2 - mean) / std).transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        x = twin.patch_embed["proj"](t_in2).flatten(2).transpose(1, 2)
        x = torch.cat([twin.cls_token.expand(1, -1, -1), x], dim=1)
        x = x + torch.cat([pos_cls, pos_rs], dim=1)
        for blk in twin.blocks:
            x = blk(x)
        want2 = twin.norm(x)[:, 1:].numpy()
    got2 = np.asarray(vit.apply({"params": params}, jnp.asarray(img2)))
    np.testing.assert_allclose(got2, want2, atol=1e-3, rtol=1e-3)
