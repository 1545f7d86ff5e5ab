"""Training losses (counterpart of lightning/loss.py).

loss = MSE + 0.5·(1 − MS-SSIM)                  (both coarse and fine heads)
     + 1000·distortion   (coarse only, gated to step > 1000)
     + 0.2·normal-consistency (same gate; alpha mask detached)

The step gates are expressed with jnp.where so one jitted train step serves
all schedule phases (the reference uses Python ifs on global_step,
lightning/loss.py:49). MS-SSIM runs in f32 (the reference wraps it in
autocast(enabled=False), lightning/loss.py:44); the number of scales adapts
to the image size (5 at ≥176px, as pytorch_msssim requires).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from lara_tpu.ops.msssim import ms_ssim

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _num_scales(h: int, w: int, win: int = 11) -> int:
    # smallest scale must stay larger than the window
    n = int(math.floor(math.log2(min(h, w) / win))) + 1
    return max(1, min(5, n))


def compute_losses(batch: Dict, output: Dict, step) -> Tuple[jnp.ndarray, Dict]:
    """batch/output follow the [B, N, H, W, ...] layout of LaRaNet.

    Returns (scalar loss, stats dict). PSNR/SSIM stats are reported exactly
    as the reference logs them (lightning/loss.py:35-47).
    """
    tar = batch["tar_rgb"].astype(jnp.float32)
    B, N, H, W, _ = tar.shape
    stats: Dict[str, jnp.ndarray] = {}
    loss = jnp.asarray(0.0, jnp.float32)

    n_scales = _num_scales(H, W)
    weights = _MSSSIM_WEIGHTS[:n_scales]
    weights = tuple(w / sum(weights) for w in weights)

    gate = jnp.where(jnp.asarray(step) > 1000, 1.0, 0.0)

    for prex in ("", "_fine"):
        if f"image{prex}" not in output:
            continue
        img = output[f"image{prex}"].astype(jnp.float32)
        err = (img - tar) ** 2
        mse = jnp.mean(err)
        loss = loss + mse
        stats[f"mse{prex}"] = mse
        stats[f"psnr{prex}"] = -10.0 * jnp.log(mse) / jnp.log(jnp.asarray(10.0))

        # Views are tiled horizontally into one [B, 3, H, N·W] image before
        # MS-SSIM, matching the reference exactly (lightning/loss.py:23,44 —
        # Gaussian windows cross view seams there, so computing per-view
        # would give slightly different values *and gradients*).
        x = img.transpose(0, 4, 2, 1, 3).reshape(B, 3, H, N * W)
        y = tar.transpose(0, 4, 2, 1, 3).reshape(B, 3, H, N * W)
        ssim_val = ms_ssim(x, y, weights=weights)
        stats[f"ssim{prex}"] = ssim_val
        loss = loss + 0.5 * (1.0 - ssim_val)

        if f"rend_dist{prex}" in output and prex != "_fine":
            distortion = jnp.mean(output[f"rend_dist{prex}"].astype(jnp.float32))
            stats[f"distortion{prex}"] = distortion
            loss = loss + gate * distortion * 1000.0

            rend_normal = output[f"rend_normal{prex}"].astype(jnp.float32)
            depth_normal = output[f"depth_normal{prex}"].astype(jnp.float32)
            acc = jax.lax.stop_gradient(output[f"acc_map{prex}"].astype(jnp.float32))
            normal_err = jnp.mean(
                (1.0 - jnp.sum(rend_normal * depth_normal, axis=-1)) * acc)
            stats[f"normal{prex}"] = normal_err
            loss = loss + gate * normal_err * 0.2

    return loss, stats
