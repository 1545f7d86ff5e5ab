"""Dataset adapters: mvgen camera rigs, grid slicing, batch assembly, vis."""

import numpy as np

from lara_tpu.data.mvgen import (ZeroPlusRig, build_mvgen_batch,
                                 generate_input_camera, slice_grid)
from lara_tpu.eval.vis import vis_images, visualize_depth
from lara_tpu.utils.camera import fov_to_ixt


def test_generate_input_camera_geometry():
    c2ws, fxfycxcy = generate_input_camera(1.5, [(30, 30), (-20, 90)], fov=30)
    assert c2ws.shape == (2, 4, 4)
    # cameras at radius r, looking at the origin
    for c2w in c2ws:
        eye = c2w[:3, 3]
        np.testing.assert_allclose(np.linalg.norm(eye), 1.5, rtol=1e-5)
        fwd = c2w[:3, 2]
        np.testing.assert_allclose(fwd, -eye / np.linalg.norm(eye), atol=1e-5)
        # rotation orthonormal
        np.testing.assert_allclose(c2w[:3, :3] @ c2w[:3, :3].T, np.eye(3), atol=1e-5)
    # normalized intrinsics: fx = 0.5/tan(fov/2)
    assert abs(fxfycxcy[0] - 0.5 / np.tan(np.deg2rad(15))) < 1e-6


def test_slice_grid():
    img = np.arange(6 * 4 * 3).reshape(6, 4, 3)
    tiles = slice_grid(img, 3, 2)
    assert len(tiles) == 6
    assert tiles[0].shape == (2, 2, 3)
    np.testing.assert_array_equal(tiles[0], img[:2, :2])
    np.testing.assert_array_equal(tiles[5], img[4:, 2:])


def test_build_mvgen_batch_contract():
    rig = ZeroPlusRig()
    c2ws, fxfycxcy = rig.cameras()
    c2ws = c2ws[rig.SUBSET]
    views = np.random.default_rng(0).uniform(size=(4, 64, 64, 3)).astype(np.float32)
    ixt = fov_to_ixt(np.array([0.6, 0.6]), np.array([64, 64]))
    batch = build_mvgen_batch(views, c2ws, np.tile(ixt[None], (4, 1, 1)))
    assert batch["tar_rgb"].shape == (4, 64, 64, 3)
    assert batch["tar_rays"].shape == (4, 64, 64, 6)
    assert batch["tar_rays_down"].shape == (4, 4, 4, 6)
    # first view canonicalized to -z at radius r
    np.testing.assert_allclose(batch["tar_c2w"][0, :3, :3], np.eye(3), atol=1e-5)
    assert batch["tar_c2w"][0, 2, 3] < 0
    r = -batch["tar_c2w"][0, 2, 3]
    np.testing.assert_allclose(batch["near_far"], [r - 0.8, r + 0.8], atol=1e-5)


def test_vis_images_panels():
    rng = np.random.default_rng(0)
    B, N, H, W = 2, 4, 16, 16
    batch = {"tar_rgb": rng.uniform(size=(B, N, H, W, 3)).astype(np.float32)}
    out = {
        "image": rng.uniform(size=(B, N, H, W, 3)).astype(np.float32),
        "depth": rng.uniform(0.5, 2.0, size=(B, N, H, W, 1)).astype(np.float32),
        "rend_normal": rng.uniform(-1, 1, size=(B, N, H, W, 3)).astype(np.float32),
        "depth_normal": rng.uniform(-1, 1, size=(B, N, H, W, 3)).astype(np.float32),
    }
    panels = vis_images(out, batch)
    assert panels["gt_rgb"].shape == (B, H, N * W, 3)
    assert panels["pred_rgb"].shape == (B, H, N * W, 3)
    assert panels["depth"].shape == (B, H, N * W, 3)
    for v in panels.values():
        assert np.isfinite(v).all() and v.min() >= 0 and v.max() <= 1.0001


def test_visualize_depth_range():
    d = np.zeros((8, 8), np.float32)
    d[2:6, 2:6] = np.linspace(1, 2, 16).reshape(4, 4)
    c = visualize_depth(d)
    assert c.shape == (8, 8, 3)
    assert c.min() >= 0 and c.max() <= 1
