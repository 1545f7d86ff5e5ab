"""Instant3D-style 4-camera-rig dataset (counterpart of
dataLoader/instant3d.py, C13).

Reads a fixed `opencv_cameras.json` rig (4 frames, w2c + fx/fy/cx/cy, poses
scaled by 1/1.7 — instant3d.py:31-53) and per-scene 2×2 mosaic images which
are split into 4 views (instant3d.py:102-112).

Note: the reference returns `tar_rgb` already mosaicked to [H, 4W, 3]
(instant3d.py:88), which its own Network.forward cannot unpack (SURVEY.md
§1) — we emit the standard [N, H, W, 3] contract instead.
"""

from __future__ import annotations

import json
import os
from glob import glob

import numpy as np

from lara_tpu.config import DatasetConfig
from lara_tpu.utils.camera import build_rays_np, canonicalize_cameras_np, intrinsic_to_fov


class Instant3DDataset:
    def __init__(self, cfg: DatasetConfig, rng=None):
        self.cfg = cfg
        self.img_size = np.array(cfg.img_size)
        self.data_root = cfg.data_root
        self.scenes_name = sorted(
            os.path.basename(p) for p in glob(os.path.join(self.data_root, "*.png")))
        self._build_camera()

    def _build_camera(self):
        info = json.load(open(os.path.join(self.data_root, "opencv_cameras.json")))
        c2ws, w2cs, ixts = [], [], []
        for i in range(4):
            frame = info["frames"][i]
            w2c = np.array(frame["w2c"], np.float32)
            c2w = np.linalg.inv(w2c)
            c2w[:3, 3] /= 1.7
            c2ws.append(c2w)
            w2cs.append(np.linalg.inv(c2w))
            ixt = np.eye(3, dtype=np.float32)
            ixt[0, 0], ixt[1, 1] = frame["fx"], frame["fy"]
            ixt[0, 2], ixt[1, 2] = frame["cx"], frame["cy"]
            ixts.append(ixt)
        self.c2ws = np.stack(c2ws)
        self.w2cs = np.stack(w2cs)
        self.ixts = np.stack(ixts)

    def __len__(self):
        return len(self.scenes_name)

    def __getitem__(self, index: int) -> dict:
        import imageio.v2 as imageio

        name = self.scenes_name[index]
        mosaic = imageio.imread(os.path.join(self.data_root, name))
        mosaic = mosaic.astype(np.float32) / 255.0
        if mosaic.shape[-1] == 4:
            mosaic = mosaic[..., :3] * mosaic[..., 3:] + (1 - mosaic[..., 3:])
        h2, w2 = mosaic.shape[0] // 2, mosaic.shape[1] // 2
        views = np.stack([
            mosaic[:h2, :w2], mosaic[:h2, w2:], mosaic[h2:, :w2], mosaic[h2:, w2:],
        ])

        H, W = int(self.img_size[1]), int(self.img_size[0])
        if views.shape[1] != H or views.shape[2] != W:
            import cv2
            views = np.stack([cv2.resize(v, (W, H)) for v in views])

        scale = np.array([W, H]) / np.array([w2, h2])
        ixts = self.ixts.copy()
        ixts[:, 0] *= scale[0]
        ixts[:, 1] *= scale[1]

        c2ws, w2cs, transform_mats = canonicalize_cameras_np(
            self.c2ws.copy(), self.w2cs.copy())
        r = np.linalg.norm(self.c2ws[0, :3, 3])
        fovx, fovy = intrinsic_to_fov(ixts[0], w=W, h=H)

        return {
            "tar_rgb": views,
            "tar_c2w": c2ws, "tar_w2c": w2cs, "tar_ixt": ixts,
            "bg_color": np.ones((4, 3), np.float32),
            "near_far": np.array([r - 0.8, r + 0.8], np.float32),
            "fovx": np.float32(fovx), "fovy": np.float32(fovy),
            "transform_mats": transform_mats,
            "meta": {"scene": name.split(".")[0], "tar_h": H, "tar_w": W},
            "tar_rays": build_rays_np(c2ws, ixts, H, W, 1.0),
            "tar_rays_down": build_rays_np(c2ws, ixts, H, W, 1.0 / 16),
        }
