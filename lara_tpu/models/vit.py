"""DINO ViT image encoder (flax).

TPU-native counterpart of the reference's `DinoWrapper`
(lightning/network.py:14-55): timm `vit_base_patch16_224.dino` with
`dynamic_img_size=True`, trainable, CLS token dropped from the output.
At LaRa's 512² inputs this yields 32×32 = 1024 patch tokens of dim 768.

Architecture (timm VisionTransformer, DINO v1 weights):
  Conv patch embed (16×16/16) → [cls] + tokens + resampled abs pos-embed →
  12 × (LN → MHSA(qkv bias) → res → LN → MLP(×4, GELU) → res) → LN.
The positional embedding is stored at its 224² native grid (14×14) and
bicubic-resampled to the runtime grid, mirroring timm's dynamic_img_size.

`convert_timm_state_dict` maps a torch checkpoint of the timm model onto
this module's params for weight-parity bring-up.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lara_tpu.models.attention import Mlp, MultiHeadAttention

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def torch_bicubic_matrix(n_in: int, n_out: int, a: float = -0.75) -> np.ndarray:
    """[n_out, n_in] 1-D interpolation matrix exactly reproducing torch's
    `F.interpolate(mode="bicubic", align_corners=False)` (the resampler timm
    uses for dynamic_img_size pos-embeds, lightning/network.py:25): cubic
    convolution kernel with A=-0.75, half-pixel centers, clamped borders.

    jax.image.resize's "bicubic" is the Keys a=-0.5 kernel — measured
    max|Δ| ≈ 0.4 (8 % of range) against torch on a 14→32 pos-embed grid,
    far too large for pretrained-checkpoint parity (VERDICT r3 item 7).
    Returned as a dense matrix: the grids are static, so the resample
    becomes two small matmuls (MXU) instead of a gather chain."""
    scale = n_in / n_out
    x = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    t = x - x0

    def w(d):
        d = np.abs(d)
        return np.where(
            d <= 1.0, ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0,
            np.where(d < 2.0, (((d - 5.0) * d + 8.0) * d - 4.0) * a, 0.0))

    m = np.zeros((n_out, n_in), np.float64)
    rows = np.arange(n_out)
    for k in range(-1, 3):
        idx = np.clip(x0 + k, 0, n_in - 1)
        np.add.at(m, (rows, idx), w(t - k))
    return m.astype(np.float32)


def resample_pos_embed(pos_grid: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """[1, Hn, Wn, D] → [1, gh, gw, D] with torch-exact bicubic (separable
    matmuls over static interpolation matrices)."""
    _, hn, wn, _ = pos_grid.shape
    mh = jnp.asarray(torch_bicubic_matrix(hn, gh))
    mw = jnp.asarray(torch_bicubic_matrix(wn, gw))
    out = jnp.einsum("oh,bhwd->bowd", mh, pos_grid)
    return jnp.einsum("ow,bhwd->bhod", mw, out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(self.dim, self.num_heads, use_bias=True,
                                   dtype=self.dtype, q_chunk=256,
                                   use_flash=self.use_flash,
                                   name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(self.dim, int(self.dim * self.mlp_ratio),
                    dtype=self.dtype, name="mlp")(y)
        return x


class _ScanViTBlock(nn.Module):
    """nn.scan body for the 12 identical ViT blocks — one compiled layer
    body (and one layer of backward HBM) instead of 12 unrolled copies;
    same motivation as lara_tpu.models.volume._ScanLayer."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True
    remat_policy: str = "full"
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, _):
        from lara_tpu.models.remat import remat_policy
        cls = (nn.remat(ViTBlock, policy=remat_policy(self.remat_policy))
               if self.remat else ViTBlock)
        x = cls(self.dim, self.num_heads, dtype=self.dtype,
                use_flash=self.use_flash, name="block")(x)
        return x, None


class DinoViT(nn.Module):
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    native_grid: int = 14       # pos-embed stored at 224/16
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True          # rematerialize block activations (B=3 at 512²
                                # otherwise exceeds v5e HBM by ~2GB)
    remat_policy: str = "full"  # see lara_tpu/models/remat.py
    use_flash: bool = False     # Pallas flash-attention kernels (ops/flash.py)

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B, H, W, 3] in [0,1] → patch tokens [B, (H/p)(W/p), dim].

        Applies the ImageNet normalization that the reference applies via the
        timm data-config processor (lightning/network.py:46), runs the
        transformer, and drops the CLS token (lightning/network.py:29).
        """
        mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
        std = jnp.asarray(IMAGENET_STD, images.dtype)
        x = (images - mean) / std
        x = x.astype(self.dtype)

        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, gh * gw, self.dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim), jnp.float32)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.native_grid * self.native_grid + 1, self.dim), jnp.float32)

        pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.native_grid, self.native_grid):
            pos_grid = pos_grid.reshape(1, self.native_grid, self.native_grid, self.dim)
            pos_grid = resample_pos_embed(pos_grid, gh, gw)
            pos_grid = pos_grid.reshape(1, gh * gw, self.dim)
        x = x + pos_grid.astype(self.dtype)
        cls_tok = jnp.broadcast_to(cls + pos_cls, (b, 1, self.dim)).astype(self.dtype)
        x = jnp.concatenate([cls_tok, x], axis=1)

        scan = nn.scan(
            _ScanViTBlock, variable_axes={"params": 0},
            split_rngs={"params": True}, in_axes=nn.broadcast,
            length=self.depth)
        x, _ = scan(self.dim, self.num_heads, dtype=self.dtype,
                    remat=self.remat, remat_policy=self.remat_policy,
                    use_flash=self.use_flash,
                    name="blocks")(x, None)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 1:]  # drop CLS


def convert_timm_state_dict(state_dict: Dict[str, Any], depth: int = 12) -> Dict[str, Any]:
    """Convert a timm `vit_base_patch16_224.dino` torch state_dict (tensors or
    numpy arrays) into this module's flax params tree.

    Use offline with a locally available checkpoint to reproduce the
    reference's pretrained encoder initialization.
    """
    def a(t):
        return np.asarray(t, dtype=np.float32)

    p: Dict[str, Any] = {}
    p["patch_embed"] = {
        "kernel": a(state_dict["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
        "bias": a(state_dict["patch_embed.proj.bias"]),
    }
    p["cls_token"] = a(state_dict["cls_token"])
    p["pos_embed"] = a(state_dict["pos_embed"])
    layers = []
    for i in range(depth):
        pre = f"blocks.{i}."
        qkv_w = a(state_dict[pre + "attn.qkv.weight"])  # [3*dim, dim]
        qkv_b = a(state_dict[pre + "attn.qkv.bias"])
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        layers.append({
            "norm1": {"scale": a(state_dict[pre + "norm1.weight"]),
                      "bias": a(state_dict[pre + "norm1.bias"])},
            "attn": {
                "q_proj": {"kernel": qw.T, "bias": qb},
                "k_proj": {"kernel": kw.T, "bias": kb},
                "v_proj": {"kernel": vw.T, "bias": vb},
                "out_proj": {"kernel": a(state_dict[pre + "attn.proj.weight"]).T,
                             "bias": a(state_dict[pre + "attn.proj.bias"])},
            },
            "norm2": {"scale": a(state_dict[pre + "norm2.weight"]),
                      "bias": a(state_dict[pre + "norm2.bias"])},
            "mlp": {
                "fc1": {"kernel": a(state_dict[pre + "mlp.fc1.weight"]).T,
                        "bias": a(state_dict[pre + "mlp.fc1.bias"])},
                "fc2": {"kernel": a(state_dict[pre + "mlp.fc2.weight"]).T,
                        "bias": a(state_dict[pre + "mlp.fc2.bias"])},
            },
        })
    p["blocks"] = {"block": stack_layers(layers)}
    p["norm"] = {"scale": a(state_dict["norm.weight"]),
                 "bias": a(state_dict["norm.bias"])}
    return p


def stack_layers(layers):
    """Per-layer param trees → one tree with a leading layer axis (the
    nn.scan layout of the stacked transformer blocks)."""
    import jax

    if not layers:
        return {}
    return jax.tree.map(lambda *leaves: np.stack(leaves, axis=0), *layers)
