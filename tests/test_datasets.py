"""Dataset adapters: mvgen camera rigs, grid slicing, batch assembly, vis."""

import numpy as np

from lara_tpu.data.mvgen import (RIGS, SV3D_FRAMES, ZERO123_SUBSET,
                                 MultiViewGenerator, build_mvgen_batch,
                                 generate_input_camera, rig_cameras,
                                 slice_grid)
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


def test_rig_constants_match_reference():
    """Rig literals from dataLoader/mvgen.py:219 (v1.1), :259 (v1.2),
    :295 (sv3d): radius 2.7, the (pitch, 225+offset) pose tables, and the
    fovs 50/30/33.8; view-selection constants from :203/:286."""
    assert RIGS["zero123plus-v1.1"] == (
        2.7, [(30, 255), (30, 375), (30, 495), (-20, 555)], 50.0)
    assert RIGS["zero123plus-v1.2"] == (
        2.7, [(20, 255), (20, 375), (20, 495), (-10, 555)], 30.0)
    assert RIGS["sv3d"] == (2.7, [(20, 225), (20, 315), (20, 405), (20, 495)], 33.8)
    assert ZERO123_SUBSET == [0, 2, 4, 5]
    assert SV3D_FRAMES == [0, 4, 8, 12]

    for name, (r, poses, fov) in RIGS.items():
        c2ws, fxfycxcy = rig_cameras(name)
        assert c2ws.shape == (4, 4, 4)
        assert abs(fxfycxcy[0] - 0.5 / np.tan(np.deg2rad(fov / 2))) < 1e-6
        for (pitch, yaw), c2w in zip(poses, c2ws):
            p, y = np.deg2rad(pitch), np.deg2rad(yaw)
            expect_eye = r * np.array(
                [np.cos(p) * np.cos(y), np.cos(p) * np.sin(y), np.sin(p)])
            np.testing.assert_allclose(c2w[:3, 3], expect_eye, atol=1e-5)
            # looking at the origin, world-up -z convention
            np.testing.assert_allclose(c2w[:3, 2], -expect_eye / r, atol=1e-5)
            assert c2w[:3, 1] @ np.array([0, 0, -1.0]) > 0
            np.testing.assert_allclose(c2w[:3, :3] @ c2w[:3, :3].T,
                                       np.eye(3), atol=1e-5)


def test_generator_backends_dispatch():
    """All three backends produce 4 views + rig cameras through injected
    pipelines; text→3D chains through a text_to_image backend."""
    grid = np.random.default_rng(1).uniform(size=(96, 64, 3)).astype(np.float32)

    for backend in ("zero123plus-v1.1", "zero123plus-v1.2"):
        gen = MultiViewGenerator(backend, pipeline=lambda img: grid)
        views, c2ws, fxfycxcy = gen.generate(
            image=np.ones((32, 32, 3), np.float32), img_size=32)
        assert views.shape == (4, 32, 32, 3)
        np.testing.assert_allclose(c2ws, rig_cameras(backend)[0], atol=1e-6)

    video = np.random.default_rng(2).uniform(size=(21, 48, 48, 3)).astype(np.float32)
    gen = MultiViewGenerator("sv3d", pipeline=lambda img: video)
    views, c2ws, _ = gen.generate(image=np.ones((32, 32, 3), np.float32),
                                  img_size=32)
    assert views.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(c2ws, rig_cameras("sv3d")[0], atol=1e-6)

    # text→3D: prompt → (injected) text_to_image → image path
    gen = MultiViewGenerator("zero123plus-v1.1", pipeline=lambda img: grid,
                             text_to_image=lambda p: np.ones((32, 32, 3), np.float32))
    views, _, _ = gen.generate(prompt="a chair", img_size=32)
    assert views.shape == (4, 32, 32, 3)

    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        MultiViewGenerator("zero123plus-v1.1", pipeline=lambda img: grid
                           ).generate(prompt="no backend")
    with _pytest.raises(ValueError):
        MultiViewGenerator("nope")


def test_build_mvgen_batch_contract():
    c2ws, fxfycxcy = rig_cameras("zero123plus-v1.1")
    views = np.random.default_rng(0).uniform(size=(4, 64, 64, 3)).astype(np.float32)
    batch = build_mvgen_batch(views, c2ws, fxfycxcy)
    assert batch["tar_rgb"].shape == (4, 64, 64, 3)
    assert batch["tar_rays"].shape == (4, 64, 64, 6)
    assert batch["tar_rays_down"].shape == (4, 4, 4, 6)
    # first view canonicalized to -z at radius r
    np.testing.assert_allclose(batch["tar_c2w"][0, :3, :3], np.eye(3), atol=1e-5)
    assert batch["tar_c2w"][0, 2, 3] < 0
    r = -batch["tar_c2w"][0, 2, 3]
    np.testing.assert_allclose(batch["near_far"], [r - 0.8, r + 0.8], atol=1e-5)


def fake_zero123plus_pipeline(image: np.ndarray) -> np.ndarray:
    """Deterministic fake-diffusion fixture (VERDICT r3 item 10): a
    procedural stand-in for the zero123plus UNet producing the exact
    output contract — a 3×2 grid [3H, 2W, 3] in [0, 1] of per-view object
    renders on the model's gray background. Each tile shows a disc whose
    hue and position vary deterministically with the view index and the
    conditioning image's mean intensity, so downstream slicing/matting/
    batch assembly can be asserted end-to-end with no weights."""
    h = w = 96
    mean = float(np.mean(image))
    tiles = []
    for v in range(6):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        cx = w / 2 + 10 * np.cos(v * np.pi / 3)
        cy = h / 2 + 10 * np.sin(v * np.pi / 3)
        r = np.hypot(xx - cx, yy - cy)
        inside = (r < 16 + 12 * mean).astype(np.float32)[..., None]
        # saturated per-view colors (never near the 0.5 gray background)
        color = np.array([0.95 if (v + 1) & (1 << c) else 0.05
                          for c in range(3)], np.float32)
        tile = inside * color + (1 - inside) * 0.5   # gray bg like the model
        tiles.append(tile)
    rows = [np.concatenate(tiles[i * 2:(i + 1) * 2], axis=1) for i in range(3)]
    return np.concatenate(rows, axis=0).astype(np.float32)


def test_fake_diffusion_full_path(tmp_path):
    """generate→slice→matte→batch through MVGenDataset with the procedural
    pipeline: views are white-composited discs, batch schema is standard."""
    import imageio.v2 as imageio

    from lara_tpu.config import DatasetConfig
    from lara_tpu.data.mvgen import MVGenDataset

    img = (np.ones((80, 60, 3)) * [[0.2, 0.4, 0.6]]).astype(np.float32)
    path = tmp_path / "cond.png"
    imageio.imwrite(path, (img * 255).astype(np.uint8))

    cfg = DatasetConfig(data_root=str(tmp_path), img_size=(64, 64))
    ds = MVGenDataset(cfg, image_paths=[str(path)],
                      pipeline=fake_zero123plus_pipeline)
    assert len(ds) == 1
    batch = ds[0]
    assert batch["tar_rgb"].shape == (4, 64, 64, 3)
    assert batch["tar_rays"].shape == (4, 64, 64, 6)
    # matting turned the gray diffusion background white
    corners = batch["tar_rgb"][:, :4, :4, :]
    np.testing.assert_allclose(corners, 1.0, atol=0.02)
    # the object survived: each view keeps a saturated disc
    assert (batch["tar_rgb"].reshape(4, -1).min(axis=1) < 0.6).all()
    # determinism: the same conditioning image gives the same batch
    batch2 = ds[0]
    np.testing.assert_array_equal(batch["tar_rgb"], batch2["tar_rgb"])


def test_estimate_alpha_matte_holes_and_bg():
    """Border-connected background keys out; object pixels of background
    color ENCLOSED by the object (highlights) stay opaque."""
    from lara_tpu.data.mvgen import estimate_alpha_matte

    img = np.full((64, 64, 3), 0.5, np.float32)       # gray bg
    img[16:48, 16:48] = [0.9, 0.2, 0.1]               # object
    img[28:36, 28:36] = 0.5                           # bg-colored hole inside
    a = estimate_alpha_matte(img)[..., 0]
    assert a[:8, :8].max() == 0.0                     # bg keyed out
    assert a[20, 20] == 1.0                           # object opaque
    assert a[32, 32] == 1.0                           # enclosed hole kept


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


def test_co3d_normalization_protocol():
    """tools/prepare_co3d.py viewset-diffusion normalization: after the
    numpy port of ref prepare_dataset_co3d.py:59-168, the cloud is centered,
    fits the 0.95 cube, and camera↔world relations are preserved."""
    import sys

    sys.path.insert(0, "tools")
    from prepare_co3d import normalize_sequence_np, p3d_to_c2w

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(500, 3)) * [1.0, 2.0, 0.5] + [4.0, -2.0, 1.0]

    # cameras on a ring looking at the cloud center, pytorch3d convention
    Rs, Ts = [], []
    for ang in np.linspace(0, 2 * np.pi, 12, endpoint=False):
        eye = np.array([4.0, -2.0, 1.0]) + 6.0 * np.array(
            [np.cos(ang), np.sin(ang), 0.3])
        z = (np.array([4.0, -2.0, 1.0]) - eye)
        z /= np.linalg.norm(z)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_w2c = np.stack([x, y, z])          # rows: camera axes in world
        # pytorch3d: x_cam = x_world @ R + T  ⇒  R = R_w2c.T
        Rs.append(R_w2c.T)
        Ts.append(-eye @ R_w2c.T)
    R, T = np.stack(Rs), np.stack(Ts)

    # record cam-space coords of a world point before normalization
    probe = pts[0]
    before = probe @ R[3] + T[3]

    Rn, Tn, pn = normalize_sequence_np(pts, R, T)
    assert np.abs(pn).max() <= 0.475 + 1e-5          # 0.95 cube of side 1
    rngs = pn.max(0) - pn.min(0)
    assert abs(pn.max(0)[1] - rngs[1] / 2) < 1e-5    # y-extent centered
    # normalization is a similarity transform: cam-space geometry preserved
    # up to the global scale
    pn_probe = pn[0]
    after = pn_probe @ Rn[3] + Tn[3]
    scale = np.linalg.norm(after) / np.linalg.norm(before)
    np.testing.assert_allclose(after, before * scale, atol=1e-4)

    # c2w conversion: camera center = -T @ R^T, OpenCV z-forward
    c2w = p3d_to_c2w(Rn[0], Tn[0])
    np.testing.assert_allclose(c2w[:3, 3], -Tn[0] @ Rn[0].T, atol=1e-5)
    np.testing.assert_allclose(c2w[:3, :3] @ c2w[:3, :3].T, np.eye(3), atol=1e-5)
    # the OpenCV forward axis (+z) looks toward the cloud
    fwd = c2w[:3, 2]
    to_origin = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
    assert fwd @ to_origin > 0.8


def test_objaverse_raw_downloader_resume(tmp_path):
    """existing_scenes skip-list matches the reference's resume behavior
    (tools/download_objaverse.py:11-30): tars and unpacked folders count."""
    from tools.download_objaverse_raw import existing_scenes

    (tmp_path / "0").mkdir()
    (tmp_path / "0" / "10010.tar").write_bytes(b"x")
    (tmp_path / "0" / "10011").mkdir()
    (tmp_path / "5").mkdir()
    (tmp_path / "5" / "99.tar").write_bytes(b"x")
    (tmp_path / "not_a_dir.txt").write_text("ignore me")
    got = existing_scenes(str(tmp_path))
    assert got == {"0/10010", "0/10011", "5/99"}
    assert existing_scenes(str(tmp_path / "missing")) == set()


def test_threaded_loader_per_thread_h5_handles(tmp_path):
    """Sustained multi-worker loading through the dataset must survive: a
    SHARED h5py File handle across loader threads segfaulted inside
    libhdf5 during the round-5 quality run (h5py's lock does not make
    libhdf5 concurrency safe on the raw-chunk path), so GObjaverseDataset
    now opens one handle per thread. 4 workers × several epochs here
    exercises exactly the crashing pattern."""
    import threading

    from lara_tpu.config import DatasetConfig
    from lara_tpu.data.loader import DataLoader
    from lara_tpu.data.synthetic import SyntheticDataset

    ds_cfg = DatasetConfig(dataset_name="synthetic",
                           data_root=str(tmp_path / "syn.h5"),
                           split="train", img_size=(64, 64), n_group=2,
                           n_scenes=8, batch_size=2, num_workers=4)
    ds = SyntheticDataset(ds_cfg)
    # distinct handle per thread
    handles = {}

    def grab(tid):
        handles[tid] = ds.metas  # hold the object (id() could be reused)

    ts = [threading.Thread(target=grab, args=(t,)) for t in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len({id(v) for v in handles.values()}) == len(handles)

    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=4)
    for epoch in range(4):
        loader.set_epoch(epoch)
        for batch in loader:
            assert np.isfinite(batch["tar_rgb"]).all()
