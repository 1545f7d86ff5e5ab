"""Evaluation metrics: PSNR / SSIM (+ depth metrics from tools/depth.py).

The eval protocol (evaluation.py:75-111): PSNR on the novel-view crop,
single-scale SSIM (pytorch_msssim.ssim), depth absolute error and
acc@τ within the object mask."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lara_tpu.ops.msssim import ssim as ssim_jax


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(pred, np.float64) - np.asarray(gt, np.float64)) ** 2))
    if mse == 0.0:  # identical images: define PSNR as +inf without the
        return float("inf")  # divide-by-zero RuntimeWarning
    return float(-10.0 * np.log(mse) / np.log(10.0))


def ssim(pred: np.ndarray, gt: np.ndarray) -> float:
    """pred/gt [H, W, 3] in [0,1]."""
    x = jnp.asarray(pred, jnp.float32)[None].transpose(0, 3, 1, 2)
    y = jnp.asarray(gt, jnp.float32)[None].transpose(0, 3, 1, 2)
    return float(ssim_jax(x, y))


def abs_error(depth_pred, depth_gt, mask) -> np.ndarray:
    """tools/depth.py:3-7."""
    depth_pred = np.asarray(depth_pred)[np.asarray(mask, bool)]
    depth_gt = np.asarray(depth_gt)[np.asarray(mask, bool)]
    return np.abs(depth_pred - depth_gt)


def acc_threshold(depth_pred, depth_gt, mask, threshold: float) -> np.ndarray:
    """Fraction of in-mask pixels with |err| < threshold (tools/depth.py:9-14)."""
    errors = abs_error(depth_pred, depth_gt, mask)
    return (errors < threshold).astype(np.float32)
