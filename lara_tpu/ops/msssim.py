"""SSIM / MS-SSIM in JAX (replaces the `pytorch_msssim` dependency).

Matches pytorch_msssim's defaults used by the reference
(lightning/loss.py:15: MS_SSIM(data_range=1.0, size_average=True, channel=3)):
11x11 Gaussian window with sigma 1.5, separable convolution with *valid*
padding, K1=0.01, K2=0.03, 5 scales weighted
[0.0448, 0.2856, 0.3001, 0.2363, 0.1333], 2x average-pool (count_pad=False
irrelevant with even sizes) between scales, and ReLU on intermediate cs values.

The reference computes it in an fp32 autocast island (lightning/loss.py:44);
these functions likewise force f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)


def _band(n: int, win: jnp.ndarray) -> jnp.ndarray:
    """[n, n-k+1] banded matrix B with B[i, j] = win[i-j] (valid conv as a
    matmul). Constant-folded at compile time."""
    k = win.shape[0]
    out = n - k + 1
    i = jnp.arange(n)[:, None]
    j = jnp.arange(out)[None, :]
    d = i - j
    return jnp.where((d >= 0) & (d < k), win[jnp.clip(d, 0, k - 1)], 0.0)


def _blur(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-padding Gaussian filter over the trailing two axes.
    x: [N, C, H, W].

    Expressed as two banded matmuls instead of 1-channel convolutions: a
    conv with C_in = C_out = 1 cannot feed the MXU and measured 615 ms per
    MS-SSIM head at the training shape [3, 3, 512, 4096]; the (flop-wasteful
    but dense) banded matmuls run on the systolic array instead."""
    h, w = x.shape[-2], x.shape[-1]
    bh = _band(h, win)
    bw = _band(w, win)
    x = jnp.einsum("nchw,hi->nciw", x, bh, precision=jax.lax.Precision.HIGH)
    return jnp.einsum("nciw,wj->ncij", x, bw, precision=jax.lax.Precision.HIGH)


def _ssim_components(x, y, win, data_range=1.0, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = _blur(x * x, win) - mu_xx
    sigma_y = _blur(y * y, win) - mu_yy
    sigma_xy = _blur(x * y, win) - mu_xy
    cs = (2.0 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return ssim_map, cs


def ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
         win_size: int = 11, win_sigma: float = 1.5) -> jnp.ndarray:
    """Mean single-scale SSIM. x, y: [N, C, H, W] in [0, data_range]."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    win = _gaussian_kernel(win_size, win_sigma)
    ssim_map, _ = _ssim_components(x, y, win, data_range)
    return jnp.mean(ssim_map)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    n, c, h, w = x.shape
    x = x[:, :, : h - h % 2, : w - w % 2]
    x = x.reshape(n, c, h // 2, 2, w // 2, 2)
    return jnp.mean(x, axis=(3, 5))


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
            win_size: int = 11, win_sigma: float = 1.5,
            weights=_MSSSIM_WEIGHTS) -> jnp.ndarray:
    """Mean multi-scale SSIM. x, y: [N, C, H, W]; H, W must stay > win_size
    across all scales (>= 176 px for the default 5 scales, as in
    pytorch_msssim)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    win = _gaussian_kernel(win_size, win_sigma)
    weights = jnp.asarray(weights, jnp.float32)
    vals = []
    for i in range(len(weights)):
        ssim_map, cs = _ssim_components(x, y, win, data_range)
        if i < len(weights) - 1:
            vals.append(jnp.maximum(jnp.mean(cs), 0.0))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
        else:
            vals.append(jnp.maximum(jnp.mean(ssim_map), 0.0))
    vals = jnp.stack(vals)
    # d(v^w)/dv → inf at v=0; clamp (only bites on pathological inputs)
    return jnp.prod(jnp.maximum(vals, 1e-6) ** weights)
