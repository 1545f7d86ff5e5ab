"""Gaussian-parameter decoders (coarse per-voxel MLP + fine SH cross-attention).

Counterpart of lightning/network.py:215-284. The coarse head maps each
upsampled voxel feature to K surfels' (offset, SH, opacity, scale, rotation);
the fine head refines SH by cross-attending each surviving surfel's feature
against its per-view point features (RGB ref + coarse render channels +
depth-reprojection error; cond dim 8).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lara_tpu.models.attention import MultiHeadAttention


class CoarseDecoder(nn.Module):
    in_dim: int
    sh_dim: int
    scaling_dim: int = 2
    rotation_dim: int = 4
    opacity_dim: int = 1
    K: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def out_dim(self):
        return 3 + self.sh_dim + self.opacity_dim + self.scaling_dim + self.rotation_dim

    @nn.compact
    def __call__(self, feats: jnp.ndarray, opacity_shift: float, scaling_shift: float):
        """feats [B, Nv, in_dim] → per-surfel params with N = Nv·K rows.

        Returns (offset [B,N,3] in (-1,1), sh [B,N,sh_dim/3,3],
        scaling [B,N,2] raw, rotation [B,N,4] raw, opacity [B,N,1] raw);
        mirrors Decoder.forward_coarse (lightning/network.py:259-278)
        including the additive opacity/scaling shifts and f32 outputs.
        """
        x = feats.astype(self.dtype)
        init = nn.initializers.xavier_uniform()
        x = nn.Dense(self.in_dim, dtype=self.dtype, kernel_init=init, name="fc0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.in_dim, dtype=self.dtype, kernel_init=init, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim * self.K, dtype=self.dtype, kernel_init=init, name="out")(x)
        x = x.astype(jnp.float32)

        b = x.shape[0]
        x = x.reshape(b, -1, self.K, self.out_dim)
        splits = jnp.split(
            x,
            [3, 3 + self.sh_dim, 3 + self.sh_dim + self.opacity_dim,
             3 + self.sh_dim + self.opacity_dim + self.scaling_dim],
            axis=-1,
        )
        offset, sh, opacity, scaling, rotation = splits
        opacity = opacity + opacity_shift
        scaling = scaling + scaling_shift
        offset = nn.sigmoid(offset) * 2.0 - 1.0

        return (
            offset.reshape(b, -1, 3),
            sh.reshape(b, -1, self.sh_dim // 3, 3),
            scaling.reshape(b, -1, self.scaling_dim),
            rotation.reshape(b, -1, self.rotation_dim),
            opacity.reshape(b, -1, self.opacity_dim),
        )


class FineDecoder(nn.Module):
    in_dim: int
    sh_dim: int
    cond_dim: int = 8
    num_heads: int = 8
    hidden: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, volume_feat: jnp.ndarray, point_feats: jnp.ndarray,
                 view_mask=None):
        """volume_feat [M, in_dim]; point_feats [M, V, cond_dim] →
        SH residual [M, sh_dim] (lightning/network.py:280-284).
        view_mask [V] bool drops deselected views (use_rand_views)."""
        q = nn.LayerNorm(dtype=self.dtype, name="norm")(
            volume_feat.astype(self.dtype))[:, None, :]          # [M,1,C]
        kv_mask = None
        if view_mask is not None:
            kv_mask = jnp.broadcast_to(view_mask[None, :],
                                       point_feats.shape[:2])
        x = MultiHeadAttention(self.in_dim, self.num_heads, kv_dim=self.cond_dim,
                               use_bias=False, dtype=self.dtype,
                               name="cross_att")(q, point_feats.astype(self.dtype),
                                                 kv_mask=kv_mask)
        init = nn.initializers.xavier_uniform()
        x = nn.Dense(self.hidden, dtype=self.dtype, kernel_init=init, name="fc0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.sh_dim, dtype=self.dtype, kernel_init=init, name="fc1")(x)
        return x[:, 0, :].astype(jnp.float32)
