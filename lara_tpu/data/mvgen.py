"""Multi-view generation front-end: single image (or text) → posed views →
standard LaRa batch.

Counterpart of dataLoader/mvgen.py (C15). The diffusion models themselves
(zero123plus via diffusers hub pipelines, SV3D via the vendored sgm stack)
are treated as pluggable host-side *generator backends* behind one
interface — `MultiViewGenerator.generate(image|prompt) -> (views [V,H,W,3],
c2ws [V,4,4], ixts [V,3,3])` — rather than porting the diffusion stack
(SURVEY.md §2.4). The camera rigs, grid slicing, background matting contract
and batch assembly are reproduced exactly; generator backends gate on their
optional dependencies.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from lara_tpu.config import DatasetConfig
from lara_tpu.utils.camera import build_rays_np, canonicalize_cameras_np


def generate_input_camera(r: float, poses, fov: float = 50.0):
    """Orbit rig: poses [(pitch_deg, yaw_deg)] at radius r looking at the
    origin with world-up -z (dataLoader/mvgen.py:303-336).
    Returns (c2ws [V,4,4], fxfycxcy [4] normalized intrinsics)."""
    poses = np.deg2rad(np.asarray(poses, np.float32))
    pitch, yaw = poses[:, 0], poses[:, 1]
    z = r * np.sin(pitch)
    x = r * np.cos(pitch) * np.cos(yaw)
    y = r * np.cos(pitch) * np.sin(yaw)
    cam_pos = np.stack([x, y, z], -1)

    def norm(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    forward = norm(-cam_pos)
    up = np.broadcast_to(np.array([0.0, 0.0, -1.0], np.float32), forward.shape)
    left = norm(np.cross(up, forward))
    up = norm(np.cross(forward, left))
    rot = np.stack((left, up, forward), axis=-1)

    c2ws = np.broadcast_to(np.eye(4, dtype=np.float32), (len(poses), 4, 4)).copy()
    c2ws[:, :3, :3] = rot
    c2ws[:, :3, 3] = cam_pos
    fx = 0.5 / np.tan(np.deg2rad(fov / 2))
    return c2ws.astype(np.float32), np.array([fx, fx, 0.5, 0.5], np.float32)


def slice_grid(img: np.ndarray, rows: int, cols: int):
    """Split a diffusion output grid into tiles (dataLoader/mvgen.py:196-208
    slices the 3×2 zero123plus grid into 6 views)."""
    h, w = img.shape[0] // rows, img.shape[1] // cols
    return [img[r * h:(r + 1) * h, c * w:(c + 1) * w]
            for r in range(rows) for c in range(cols)]


class ZeroPlusRig:
    """zero123plus v1.x camera rig: 6 views at fixed elevations/azimuths,
    the standard subset [0, 2, 4, 5] used by LaRa (dataLoader/mvgen.py:218,
    258), radius 1.5/1.7-normalized, fov 30°."""

    POSES_V11 = [(30, 30), (-20, 90), (30, 150), (-20, 210), (30, 270), (-20, 330)]
    SUBSET = [0, 2, 4, 5]

    def cameras(self, radius: float = 1.5, fov: float = 30.0):
        c2ws, fxfycxcy = generate_input_camera(radius, self.POSES_V11, fov=fov)
        return c2ws, fxfycxcy


class MultiViewGenerator:
    """Backend-pluggable image/text → posed multi-view generator."""

    def __init__(self, backend: str = "zero123plus_v11"):
        self.backend = backend
        self._pipe = None

    def _load_zero123plus(self, version: str):
        from diffusers import DiffusionPipeline  # optional dependency
        import torch

        repo = {"v11": "sudo-ai/zero123plus-v1.1",
                "v12": "sudo-ai/zero123plus-v1.2"}[version]
        pipe = DiffusionPipeline.from_pretrained(
            repo, custom_pipeline="sudo-ai/zero123plus-pipeline",
            torch_dtype=torch.float32)
        return pipe

    def generate(self, image: Optional[np.ndarray] = None,
                 prompt: Optional[str] = None, img_size: int = 512,
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (views [V,H,W,3] float in [0,1] white-composited,
        c2ws [V,4,4], ixts [V,3,3] pixel intrinsics)."""
        if self.backend.startswith("zero123plus"):
            version = self.backend.split("_")[-1]
            if self._pipe is None:
                self._pipe = self._load_zero123plus(version)
            from PIL import Image

            cond = Image.fromarray((image * 255).astype(np.uint8))
            result = self._pipe(cond, num_inference_steps=30).images[0]
            grid = np.asarray(result).astype(np.float32) / 255.0
            views6 = slice_grid(grid, 3, 2)
            views = [matte_white(cv2_resize(v, img_size)) for v in views6]
            views = [views[i] for i in ZeroPlusRig.SUBSET]
            rig = ZeroPlusRig()
            c2ws, fxfycxcy = rig.cameras()
            c2ws = c2ws[ZeroPlusRig.SUBSET]
            ixts = normalized_to_pixel_ixt(fxfycxcy, img_size)
            return np.stack(views), c2ws, np.tile(ixts[None], (len(views), 1, 1))
        raise NotImplementedError(f"generator backend {self.backend!r}")


def normalized_to_pixel_ixt(fxfycxcy: np.ndarray, size: int) -> np.ndarray:
    ixt = np.eye(3, dtype=np.float32)
    ixt[0, 0] = fxfycxcy[0] * size
    ixt[1, 1] = fxfycxcy[1] * size
    ixt[0, 2] = fxfycxcy[2] * size
    ixt[1, 2] = fxfycxcy[3] * size
    return ixt


def cv2_resize(img: np.ndarray, size: int) -> np.ndarray:
    import cv2

    return cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)


def matte_white(img: np.ndarray) -> np.ndarray:
    """Background matting → white composite. Uses rembg when available
    (dataLoader/mvgen.py:195-208); otherwise assumes the generator already
    produced a white background."""
    try:
        import rembg

        rgba = rembg.remove((img * 255).astype(np.uint8))
        rgba = rgba.astype(np.float32) / 255.0
        return rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])
    except Exception:
        return img


def build_mvgen_batch(views: np.ndarray, c2ws: np.ndarray, ixts: np.ndarray,
                      scene_rescale: float = 1.7) -> dict:
    """Assemble the standard LaRa batch from generated views
    (dataLoader/mvgen.py:109-157: /1.7 rescale, first-view canonicalization,
    white bg, near/far r∓0.8, full+1/16 ray grids)."""
    V, H, W, _ = views.shape
    c2ws = c2ws.copy()
    c2ws[:, :3, 3] /= scene_rescale
    w2cs = np.linalg.inv(c2ws)
    r = np.linalg.norm(c2ws[0, :3, 3])
    c2ws, w2cs, transform_mats = canonicalize_cameras_np(c2ws, w2cs)
    from lara_tpu.utils.camera import intrinsic_to_fov

    fovx, fovy = intrinsic_to_fov(ixts[0], w=W, h=H)
    batch = {
        "tar_rgb": views.astype(np.float32),
        "tar_c2w": c2ws, "tar_w2c": w2cs, "tar_ixt": ixts.astype(np.float32),
        "bg_color": np.ones((V, 3), np.float32),
        "near_far": np.array([r - 0.8, r + 0.8], np.float32),
        "fovx": np.float32(fovx), "fovy": np.float32(fovy),
        "transform_mats": transform_mats,
        "meta": {"scene": "mvgen", "tar_h": H, "tar_w": W},
        "tar_rays": build_rays_np(c2ws, ixts, H, W, 1.0),
        "tar_rays_down": build_rays_np(c2ws, ixts, H, W, 1.0 / 16),
    }
    return batch


class MVGenDataset:
    """Dataset wrapper: one generated scene per input image
    (dataLoader/mvgen.py:25-157)."""

    def __init__(self, cfg: DatasetConfig, image_paths=None, rng=None):
        self.cfg = cfg
        self.generator = MultiViewGenerator()
        if image_paths is None:
            import glob
            import os

            image_paths = sorted(glob.glob(os.path.join(cfg.data_root, "*.png")) +
                                 glob.glob(os.path.join(cfg.data_root, "*.jpg")))
        self.image_paths = image_paths

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, index: int) -> dict:
        import imageio.v2 as imageio

        img = imageio.imread(self.image_paths[index]).astype(np.float32) / 255.0
        if img.shape[-1] == 4:
            img = img[..., :3] * img[..., 3:] + (1 - img[..., 3:])
        views, c2ws, ixts = self.generator.generate(
            image=img, img_size=int(self.cfg.img_size[0]))
        batch = build_mvgen_batch(views, c2ws, ixts)
        batch["meta"]["scene"] = str(index)
        return batch
