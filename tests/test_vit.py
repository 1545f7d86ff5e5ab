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
