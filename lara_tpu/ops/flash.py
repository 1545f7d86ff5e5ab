"""Fused flash-attention for the ViT encoder (Pallas TPU kernels).

The encoder's self-attention (12 layers x [B*V, 1025, 12 heads, 64]) is the
one attention in the network with a large quadratic extent — the reference
pays it through torch SDPA inside timm (lightning/network.py:14-55). The
chunked-einsum path in `models/attention.py` already avoids materializing the
[B, h, L, L] score matrix, but its backward re-runs each chunk's softmax
through XLA ops; the Pallas flash kernels (jax.experimental.pallas.ops.tpu.
flash_attention) fuse QK^T -> online softmax -> PV into one VMEM-resident
kernel for forward AND both backward passes, which removes the HBM round
trips between those ops entirely.

This wrapper adapts the kernel's contract to the model's:
  - layout [B, L, h, hd] <-> the kernel's [B, h, L, hd];
  - arbitrary sequence lengths via padding to the 128-lane block size, with
    SegmentIds masking so padded keys never reach a real query's softmax
    (padded queries attend only padded keys — a well-defined softmax whose
    rows are sliced off — so no empty-row NaNs);
  - torch key_padding_mask semantics (kv_mask False = excluded) folded into
    the KV segment ids;
  - off-TPU it runs the same kernels under the Pallas TPU interpreter, so
    the CPU test mesh exercises the identical code path. Caveat: the
    interpreter executes through an ordered-IO callback, which jax.remat's
    partial-eval rejects — off-TPU callers must disable remat around flash
    blocks (tests do); the compiled TPU kernel has no such effect.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu import flash_attention as _fa

_BLOCK = 128  # the kernel's default/minimum tile in both sequence dims


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _interpret_flash(scale, q, k, v, seg_q, seg_kv):
    """Off-TPU path: the same kernels under the Pallas TPU interpreter.

    `force_tpu_interpret_mode` only applies to pallas_calls traced inside its
    dynamic extent, and the kernel's own custom-VJP backward is traced later
    (when the cotangent arrives) — so this wrapper re-enters the interpreter
    context inside its own backward rule instead of relying on the caller's.
    """
    with pltpu.force_tpu_interpret_mode():
        return _fa.flash_attention(
            q, k, v, segment_ids=_fa.SegmentIds(seg_q, seg_kv),
            sm_scale=scale)


def _interpret_flash_fwd(scale, q, k, v, seg_q, seg_kv):
    return _interpret_flash(scale, q, k, v, seg_q, seg_kv), (q, k, v, seg_q, seg_kv)


def _interpret_flash_bwd(scale, res, g):
    q, k, v, seg_q, seg_kv = res
    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(
            lambda q, k, v: _fa.flash_attention(
                q, k, v, segment_ids=_fa.SegmentIds(seg_q, seg_kv),
                sm_scale=scale),
            q, k, v)
        dq, dk, dv = vjp(g)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # int cotangents
    return dq, dk, dv, f0(seg_q), f0(seg_kv)


_interpret_flash.defvjp(_interpret_flash_fwd, _interpret_flash_bwd)


def flash_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
              scale: Optional[float] = None,
              kv_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Multi-head attention via the Pallas TPU flash kernels.

    q [B, Lq, h, hd]; k, v [B, Lk, h, hd]; kv_mask [B, Lk] bool (False keys
    are excluded from every query's softmax). Returns [B, Lq, h, hd] in the
    input dtype. `scale` defaults to 1/sqrt(hd).
    """
    b, lq, h, hd = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(hd)

    pq = (-lq) % _BLOCK
    pk = (-lk) % _BLOCK

    def to_kernel(x, pad):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return jnp.moveaxis(x, 2, 1)  # [B, h, L', hd]

    qt, kt, vt = to_kernel(q, pq), to_kernel(k, pk), to_kernel(v, pk)

    on_tpu = jax.default_backend() == "tpu"
    need_seg = bool(pq or pk) or kv_mask is not None or not on_tpu
    seg = None
    if need_seg:
        seg_q = jnp.broadcast_to(jnp.arange(lq + pq) < lq, (b, lq + pq))
        valid_k = jnp.broadcast_to(jnp.arange(lk + pk) < lk, (b, lk + pk))
        if kv_mask is not None:
            valid_k = valid_k & jnp.pad(kv_mask.astype(bool), ((0, 0), (0, pk)))
        seg = _fa.SegmentIds(q=seg_q.astype(jnp.int32),
                             kv=valid_k.astype(jnp.int32))

    if on_tpu:
        out = _fa.flash_attention(qt, kt, vt, segment_ids=seg,
                                  sm_scale=float(scale))
    else:
        # CPU/virtual-mesh: same kernels under the Pallas interpreter
        out = _interpret_flash(float(scale), qt, kt, vt, seg.q, seg.kv)
    return jnp.moveaxis(out, 1, 2)[:, :lq].astype(q.dtype)
