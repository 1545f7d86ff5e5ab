"""grid_sample vs torch golden; SSIM/MS-SSIM properties + torch-free goldens."""

import jax.numpy as jnp
import numpy as np
import pytest

from lara_tpu.ops.grid_sample import grid_sample_2d
from lara_tpu.ops.msssim import ms_ssim, ssim

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(5, 9, 13)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(4, 7, 2)).astype(np.float32)  # incl. OOB

    ours = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(grid)))
    ref = F.grid_sample(
        torch.from_numpy(feats)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear", padding_mode="zeros", align_corners=False,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_align_corners_true():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(2, 6, 6)).astype(np.float32)
    grid = rng.uniform(-1, 1, size=(3, 3, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(grid), align_corners=True))
    ref = F.grid_sample(
        torch.from_numpy(feats)[None], torch.from_numpy(grid)[None],
        mode="bilinear", padding_mode="zeros", align_corners=True,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _images(seed=0, hw=192):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(2, 3, hw, hw)).astype(np.float32)
    # smooth it a bit so SSIM isn't in the noise floor
    x = (x + np.roll(x, 1, -1) + np.roll(x, 1, -2)) / 3.0
    return jnp.asarray(x)


def test_ssim_self_is_one():
    x = _images()
    assert abs(float(ssim(x, x)) - 1.0) < 1e-5
    assert abs(float(ms_ssim(x, x)) - 1.0) < 1e-4


def test_ssim_monotone_in_noise():
    x = _images()
    rng = np.random.default_rng(3)
    n1 = x + jnp.asarray(rng.normal(size=x.shape).astype(np.float32)) * 0.02
    n2 = x + jnp.asarray(rng.normal(size=x.shape).astype(np.float32)) * 0.10
    s1, s2 = float(ms_ssim(x, n1)), float(ms_ssim(x, n2))
    assert 0 < s2 < s1 < 1


def test_ssim_uniform_shift_golden():
    # For constant images x=a, y=a+d: mu diff known, sigmas=0 →
    # ssim = (2 a (a+d) + C1) / (a² + (a+d)² + C1).
    a, d = 0.4, 0.1
    x = jnp.full((1, 1, 64, 64), a)
    y = jnp.full((1, 1, 64, 64), a + d)
    c1 = 0.01 ** 2
    expected = (2 * a * (a + d) + c1) / (a * a + (a + d) ** 2 + c1)
    assert abs(float(ssim(x, y)) - expected) < 1e-4
