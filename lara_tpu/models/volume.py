"""Volume transformer: group cross-attention over the 3D token grid.

TPU-native counterpart of the reference VolTransformer/GroupAttBlock/ModLN
(lightning/network.py:57-164,190-213). The 32³ volume is partitioned into
group_axis³ local groups of block_size³ voxels; each group cross-attends only
to its own per-view image tokens, and a 3×3×3 conv propagates information
across groups (the reference's memory-scaling mechanism, SURVEY.md §5.7).

Layout is channel-last ([B, D, H, W, C]) throughout — the natural layout for
XLA convolutions and reshape-based grouping on TPU; grouping is expressed as
reshape+transpose (a free relayout under XLA fusion) instead of torch unfold.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from lara_tpu.models.attention import Mlp, MultiHeadAttention


def group_volume(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[B, D, H, W, C] → [B, G³, b³, C] with torch-unfold-compatible ordering
    (group index (gD,gH,gW) row-major; within-block (bD,bH,bW) row-major)."""
    b_, d, h, w, c = x.shape
    g = d // block
    x = x.reshape(b_, g, block, g, block, g, block, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b_, g * g * g, block * block * block, c)


def ungroup_volume(x: jnp.ndarray, block: int, reso: int) -> jnp.ndarray:
    """Inverse of group_volume: [B, G³, b³, C] → [B, D, H, W, C]."""
    b_, _, _, c = x.shape
    g = reso // block
    x = x.reshape(b_, g, g, g, block, block, block, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b_, reso, reso, reso, c)


class ModLN(nn.Module):
    """adaLN modulation: x ← LN(x)·(1+scale) + shift with (shift, scale)
    predicted from a conditioning vector (lightning/network.py:190-213)."""

    inner_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        # cond [..., mod_dim] broadcastable against x [..., inner_dim]
        mod = nn.silu(cond.astype(self.dtype))
        mod = nn.Dense(self.inner_dim * 2, dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform(), name="mlp")(mod)
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x * (1 + scale) + shift


def _group_cond(image_feats: jnp.ndarray, view_mask, n_group: int):
    """Per-layer KV grouping (lightning/network.py:144-150): group each
    view's feature volume with the layer's block size and flatten all views'
    tokens of a group into one sequence. [B, V, D, H, W, C] →
    ([B, G³, V·l, C], [B, G³, V·l] mask or None)."""
    b, v, d, h, w, c = image_feats.shape
    per_view = group_volume(image_feats.reshape(b * v, d, h, w, c),
                            d // n_group)
    g3, l = per_view.shape[1], per_view.shape[2]
    per_view = per_view.reshape(b, v, g3, l, c)
    cond = per_view.transpose(0, 2, 1, 3, 4).reshape(b, g3, v * l, c)
    if view_mask is None:
        return cond, None
    m = jnp.broadcast_to(view_mask[:, None, :, None], (b, g3, v, l))
    return cond, m.reshape(b, g3, v * l)


class GroupAttBlock(nn.Module):
    """One volume-transformer layer (lightning/network.py:57-102):
    group cross-attention → MLP → LayerNorm → 3D-conv residual."""

    inner_dim: int
    num_heads: int
    cond_dim: int
    block_size: int = 2
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray, cond_mask=None):
        """x [B, D, H, W, C]; cond is either pre-grouped per-group tokens
        [B, G³, L_cond, C_cond], or the RAW per-view feature volume
        [B, V, Df, Hf, Wf, C_cond] — then grouped here, INSIDE the layer's
        remat boundary: the grouped [B, G³, V·l, C] tensor is a pure
        relayout of the shared feature volume, and building it inside means
        the backward recomputes it instead of every layer saving its own
        84 MB remat-boundary copy (12 × 84 MB at the flagship config — the
        round-3 train-step HBM OOM). cond_mask is [B, G³, L_cond] bool, or
        the [B, V] view mask with a raw cond (False tokens dropped from
        attention — the static-shape use_rand_views path)."""
        from lara_tpu.parallel import tp

        block_size = self.block_size
        b, d, h, w, c = x.shape
        if cond.ndim == 6:
            cond, cond_mask = _group_cond(cond, cond_mask,
                                          d // block_size)
        patches = group_volume(x, block_size)                 # [B, G, l, C]
        g = patches.shape[1]
        flat = tp.shard_groups(patches.reshape(b * g, -1, c))
        cond_flat = tp.shard_groups(
            cond.reshape(b * g, cond.shape[2], cond.shape[3]).astype(self.dtype))
        mask_flat = (None if cond_mask is None
                     else tp.shard_groups(cond_mask.reshape(b * g, cond.shape[2])))

        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(flat)
        flat = flat + MultiHeadAttention(self.inner_dim, self.num_heads,
                                         kv_dim=self.cond_dim, use_bias=False,
                                         dtype=self.dtype, name="cross_attn")(
                                             y, cond_flat, kv_mask=mask_flat)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(flat)
        flat = flat + Mlp(self.inner_dim, int(self.inner_dim * self.mlp_ratio),
                          dtype=self.dtype, name="mlp")(y)
        flat = nn.LayerNorm(dtype=self.dtype, name="norm3")(flat)

        # cross-group conv needs the full volume per scene: re-shard to dp
        # (all-gather over tp), conv, and the next layer re-splits groups
        vol = tp.shard_batch_dim(
            ungroup_volume(flat.reshape(b, g, -1, c), block_size, d))
        vol = vol + nn.Conv(self.inner_dim, (3, 3, 3), use_bias=False,
                            dtype=self.dtype, name="cnn")(vol)
        return vol


class _ScanLayer(nn.Module):
    """nn.scan body: one GroupAttBlock step of the layer stack. Scanning the
    12 identical layers (reference config n_groups=(16,)) compiles ONE layer
    body instead of 12 unrolled copies — XLA then schedules the remat'd
    backward one layer at a time (the unrolled form kept every layer's
    96 MB MLP backward temps live simultaneously, ~1.2 GB of the flagship
    step's HBM OOM) and the step graph compiles ~12× less vol-decoder HLO."""

    inner_dim: int
    num_heads: int
    cond_dim: int
    block_size: int
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, x, cond_pack):
        from lara_tpu.models.remat import remat_policy
        cond, mask = cond_pack
        cls = (nn.remat(GroupAttBlock, policy=remat_policy(self.remat_policy))
               if self.remat else GroupAttBlock)
        x = cls(inner_dim=self.inner_dim, num_heads=self.num_heads,
                cond_dim=self.cond_dim, block_size=self.block_size,
                mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                name="block")(x, cond, mask)
        return x, None


class VolTransformer(nn.Module):
    """Stack of GroupAttBlocks over a learned 3D positional volume, with a
    final 2× transposed-conv upsample (lightning/network.py:105-164)."""

    embed_dim: int
    image_feat_dim: int
    vol_low_res: int
    out_dim: int
    n_groups: Sequence[int]
    num_layers: int
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, image_feats: jnp.ndarray, view_mask=None) -> jnp.ndarray:
        """image_feats [B, V, D, H, W, C_img] → volume [B, 2D, 2H, 2W, out_dim].

        Per-layer conditioning: the per-view feature volume is grouped with
        the layer's block size and all views' tokens of a group are flattened
        into one KV sequence (lightning/network.py:144-150). view_mask [B, V]
        bool excludes deselected views' tokens (use_rand_views,
        lightning/network.py:434-438, realized with static shapes).
        """
        b, v, d, h, w, c = image_feats.shape
        block_sizes = [self.vol_low_res // n for n in self.n_groups]

        r = self.vol_low_res
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(1.0 / self.embed_dim ** 0.5),
            (1, r, r, r, self.embed_dim), jnp.float32)
        x = jnp.broadcast_to(pos, (b, r, r, r, self.embed_dim)).astype(self.dtype)

        # Each layer receives the RAW per-view feature volume and builds its
        # grouped KV inside its own remat boundary — see GroupAttBlock.
        if len(set(block_sizes)) == 1:
            # identical layers (the reference config) → scanned stack
            scan = nn.scan(
                _ScanLayer, variable_axes={"params": 0},
                split_rngs={"params": True}, in_axes=nn.broadcast,
                length=self.num_layers)
            x, _ = scan(
                inner_dim=self.embed_dim, num_heads=self.num_heads,
                cond_dim=self.image_feat_dim, block_size=block_sizes[0],
                dtype=self.dtype, remat=self.remat,
                remat_policy=self.remat_policy,
                name="layers")(x, (image_feats, view_mask))
        else:
            block_cls = nn.remat(GroupAttBlock) if self.remat else GroupAttBlock
            for i in range(self.num_layers):
                gi = i % len(self.n_groups)
                x = block_cls(
                    inner_dim=self.embed_dim, num_heads=self.num_heads,
                    cond_dim=self.image_feat_dim, block_size=block_sizes[gi],
                    dtype=self.dtype, name=f"layer{i}")(x, image_feats,
                                                        view_mask)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.ConvTranspose(self.out_dim, (2, 2, 2), strides=(2, 2, 2),
                             dtype=self.dtype, name="deconv")(x)
        return x
