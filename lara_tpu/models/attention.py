"""Multi-head (cross-)attention with torch.nn.MultiheadAttention semantics.

The reference uses torch MHA in three places, always batch_first and without
attention masks:
  - GroupAttBlock.cross_attn (embed 256, kdim=vdim=800, 16 heads, bias=False;
    lightning/network.py:65-67)
  - Decoder.cross_att (embed 80, kdim=vdim=8, 8 heads, bias=False;
    lightning/network.py:235-237)
  - the ViT encoder's self-attention (qkv bias=True).

Torch packs q/k/v when dims match; functionally that is three Dense layers,
which is what we use. Scaling is 1/sqrt(head_dim).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MultiHeadAttention(nn.Module):
    dim: int
    num_heads: int
    kv_dim: Optional[int] = None   # kdim=vdim; defaults to dim (self-attn)
    use_bias: bool = False
    out_bias: Optional[bool] = None  # torch MHA out_proj bias follows `bias`
    dtype: jnp.dtype = jnp.bfloat16
    q_chunk: Optional[int] = None  # memory-efficient attention: process query
                                   # rows in chunks of this size with
                                   # per-chunk rematerialization — the
                                   # [B,h,Lq,Lk] score matrix never
                                   # materializes (at the ViT's 12×1025²
                                   # shape that is 2×327 MB of backward
                                   # buffers on the flagship step).
                                   # Numerically identical: softmax is over
                                   # k, so query chunks are independent.
    use_flash: bool = False        # fused Pallas flash-attention kernels
                                   # (ops/flash.py) instead of the einsum
                                   # paths; fwd+bwd fully kernel-fused.
                                   # Takes precedence over q_chunk.

    @nn.compact
    def __call__(self, q_in: jnp.ndarray, kv_in: Optional[jnp.ndarray] = None,
                 kv_mask: Optional[jnp.ndarray] = None):
        """q_in [B, Lq, dim]; kv_in [B, Lk, kv_dim] (None → self-attention);
        kv_mask [B, Lk] bool — False keys are excluded from the softmax
        (torch MHA key_padding_mask semantics, used by the static-shape
        `use_rand_views` path)."""
        if kv_in is None:
            kv_in = q_in
        h = self.num_heads
        hd = self.dim // h
        out_bias = self.use_bias if self.out_bias is None else self.out_bias
        dense = lambda name, bias: nn.Dense(
            self.dim, use_bias=bias, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name=name)
        q = dense("q_proj", self.use_bias)(q_in)
        k = dense("k_proj", self.use_bias)(kv_in)
        v = dense("v_proj", self.use_bias)(kv_in)

        bq, lq = q.shape[0], q.shape[1]
        lk = k.shape[1]
        q = q.reshape(bq, lq, h, hd)
        k = k.reshape(bq, lk, h, hd)
        v = v.reshape(bq, lk, h, hd)

        if self.use_flash:
            from lara_tpu.ops.flash import flash_mha
            out = flash_mha(q, k, v, kv_mask=kv_mask)
            out = out.reshape(bq, lq, self.dim)
            return dense("out_proj", out_bias)(out)

        scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32)).astype(self.dtype)

        def attend(q_rows):  # [bq, c, h, hd] -> [bq, c, h, hd]
            logits = jnp.einsum("bqhd,bkhd->bhqk", q_rows * scale,
                                k).astype(jnp.float32)
            if kv_mask is not None:
                logits = jnp.where(kv_mask[:, None, None, :], logits, -1e9)
            probs = nn.softmax(logits, axis=-1).astype(self.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

        c = self.q_chunk
        if c is not None and lq > c:
            pad = (-lq) % c
            qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
            qs = jnp.moveaxis(
                qp.reshape(bq, (lq + pad) // c, c, h, hd), 1, 0)
            # per-chunk remat: backward recomputes each chunk's scores
            # instead of the scan stacking them back into the full matrix
            outs = jax.lax.map(jax.checkpoint(attend), qs)
            out = jnp.moveaxis(outs, 0, 1).reshape(bq, lq + pad, h, hd)[:, :lq]
        else:
            out = attend(q)
        out = out.reshape(bq, lq, self.dim)
        return dense("out_proj", out_bias)(out)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, use_bias=self.use_bias, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(), name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(), name="fc2")(x)
        return x
