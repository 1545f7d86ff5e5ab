"""LPIPS perceptual metric in JAX (replaces the `lpips` pip package used at
evaluation.py:48-49).

Architecture: frozen VGG16 (or AlexNet) feature stack → per-layer channel
unit-normalization → squared diff → learned 1×1 linear weights → spatial
mean → sum over layers. Weights must be supplied offline (state-dict file
from the torchvision/lpips checkpoints — this container has no egress);
`load_lpips(path)` converts them, `load_lpips()` searches default locations
and raises if none exist.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# layer boundaries (conv indices) of the five VGG16 feature stages
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
# torchvision AlexNet features: (out_ch, kernel, stride, pad); LPIPS taps
# the ReLU after each conv (evaluation.py:49 uses lpips.LPIPS(net='alex'))
_ALEX_CFG = [(64, 11, 4, 2), "M", (192, 5, 1, 2), "M",
             (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_DEFAULT_PATHS = {
    "vgg": ("weights/lpips_vgg.npz",
            os.path.expanduser("~/.cache/lara_tpu/lpips_vgg.npz")),
    "alex": ("weights/lpips_alex.npz",
             os.path.expanduser("~/.cache/lara_tpu/lpips_alex.npz")),
}


def _vgg_features(params: List, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x [N,H,W,3] normalized; returns activations after each stage's last
    ReLU (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)."""
    feats = []
    pi = 0
    for v in _VGG_CFG:
        if v == "M":
            feats.append(x)
            x = -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                       (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        else:
            w, b = params[pi]
            pi += 1
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + b)
    return feats


def _alex_features(params: List, x: jnp.ndarray) -> List[jnp.ndarray]:
    """AlexNet feature taps: the ReLU after each of the five convs."""
    feats = []
    pi = 0
    for v in _ALEX_CFG:
        if v == "M":
            x = -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                       (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        else:
            _, k, s, pad = v
            w, b = params[pi]
            pi += 1
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + b)
            feats.append(x)
    return feats


def lpips_distance(vgg_params, lin_weights, x: jnp.ndarray, y: jnp.ndarray,
                   net: str = "vgg") -> jnp.ndarray:
    """x, y [H,W,3] in [0,1] → scalar LPIPS distance."""
    def prep(img):
        img = img * 2.0 - 1.0  # lpips expects [-1,1]
        return ((img - _SHIFT) / _SCALE)[None]

    extract = _vgg_features if net == "vgg" else _alex_features
    fx = extract(vgg_params, prep(x))
    fy = extract(vgg_params, prep(y))
    total = 0.0
    for f1, f2, w in zip(fx, fy, lin_weights):
        n1 = f1 * jax.lax.rsqrt(jnp.sum(f1 * f1, -1, keepdims=True) + 1e-10)
        n2 = f2 * jax.lax.rsqrt(jnp.sum(f2 * f2, -1, keepdims=True) + 1e-10)
        d = (n1 - n2) ** 2
        total = total + jnp.mean(jnp.sum(d * w[None, None, None, :], -1))
    return total


def load_lpips(path: Optional[str] = None, net: str = "vgg") -> Callable:
    """Returns fn(pred [H,W,3], gt [H,W,3]) → float for net ∈ {vgg, alex}
    (the reference evaluates both, evaluation.py:48-49). Expects an .npz with
    {net}_w{i}/{net}_b{i} and lin{i} arrays (see tools/convert_lpips.py)."""
    candidates = [path] if path else list(_DEFAULT_PATHS[net])
    found = next((p for p in candidates if p and os.path.exists(p)), None)
    if found is None:
        raise FileNotFoundError(
            f"LPIPS-{net} weights not found (zero-egress container); convert "
            "them offline with tools/convert_lpips.py")
    data = np.load(found)
    cfg = _VGG_CFG if net == "vgg" else _ALEX_CFG
    n_conv = sum(1 for v in cfg if v != "M")
    conv_params = [(jnp.asarray(data[f"{net}_w{i}"]),
                    jnp.asarray(data[f"{net}_b{i}"])) for i in range(n_conv)]
    lin_weights = [jnp.asarray(data[f"lin{i}"]) for i in range(5)]
    fn = jax.jit(lambda x, y: lpips_distance(conv_params, lin_weights, x, y, net))
    return lambda x, y: float(fn(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))
