"""Google Scanned Objects eval dataset (counterpart of
dataLoader/google_scanned_objects.py).

Per-scene folders with `transforms.json` (Blender-convention poses converted
with the b2c flip, per-frame intrinsic_matrix), `r_{idx:03d}.png` RGBA
renders and `depth/r_{idx:03d}.pfm` depths. Views are grouped by KMeans over
camera positions at init; near/far fixed to (0.5, 2.5)."""

from __future__ import annotations

import json
import os
import re

import numpy as np

from lara_tpu.config import DatasetConfig
from lara_tpu.utils.camera import build_rays_np, canonicalize_cameras_np, intrinsic_to_fov

B2C = np.array([[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], np.float32)


def kmeans_groups(xyz: np.ndarray, n_clusters: int):
    """KMeans view clusters (dataLoader/utils.py:55-65; same fixed seed)."""
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=n_clusters, n_init=10, random_state=20211202).fit(xyz)
    return [np.where(km.labels_ == i)[0].astype(np.uint8) for i in range(n_clusters)]


def read_pfm(filename: str):
    """Portable float map reader (dataLoader/utils.py:120-155 equivalent)."""
    with open(filename, "rb") as f:
        header = f.readline().decode("utf-8").rstrip()
        if header not in ("PF", "Pf"):
            raise ValueError("Not a PFM file.")
        color = header == "PF"
        dims = re.match(r"^(\d+)\s(\d+)\s$", f.readline().decode("utf-8"))
        if not dims:
            raise ValueError("Malformed PFM header.")
        width, height = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)), abs(scale)


class GSODataset:
    def __init__(self, cfg: DatasetConfig, rng=None):
        self.cfg = cfg
        self.split = cfg.split
        self.img_size = np.array(cfg.img_size)
        self.img_downscale = self.img_size / 512
        self.n_group = cfg.n_group
        self.rng = rng or np.random.default_rng(0)
        self.data_root = cfg.data_root

        self.scenes_name = np.array(sorted(
            f for f in os.listdir(self.data_root)
            if os.path.isdir(os.path.join(self.data_root, f))))
        self.scene_infos = {s: self._build_meta(s) for s in self.scenes_name}

    def _build_meta(self, scene: str):
        info = json.load(open(os.path.join(self.data_root, scene, "transforms.json")))
        out = {"ixts": [], "c2ws": [], "w2cs": [], "fovx": [], "fovy": [],
               "img_paths": [], "depth_paths": []}
        positions = []
        for idx, frame in enumerate(info["frames"]):
            c2w = np.array(frame["transform_matrix"], np.float32) @ B2C
            ixt = np.array(frame["intrinsic_matrix"], np.float32)
            fx, fy = intrinsic_to_fov(ixt)
            out["ixts"].append(ixt)
            out["c2ws"].append(c2w)
            out["w2cs"].append(np.linalg.inv(c2w))
            out["fovx"].append(fx)
            out["fovy"].append(fy)
            out["img_paths"].append(os.path.join(self.data_root, scene, f"r_{idx:03d}.png"))
            out["depth_paths"].append(os.path.join(self.data_root, scene, f"depth/r_{idx:03d}.pfm"))
            positions.append(c2w[:3, 3])
        pos = np.stack(positions)
        out["groups"] = kmeans_groups(pos, self.n_group)
        out["groups_4"] = kmeans_groups(pos, 4)
        return out

    def __len__(self):
        return len(self.scenes_name)

    def _read_image(self, scene_info, idx, bg):
        import imageio.v2 as imageio
        import cv2

        img = imageio.imread(scene_info["img_paths"][idx])
        if self.img_downscale[0] != 1 or self.img_downscale[1] != 1:
            img = cv2.resize(img, tuple(int(v) for v in self.img_size))
        mask = (img[..., -1] > 0).astype(np.uint8)
        img = img.astype(np.float32) / 255.0
        img = img[..., :3] * img[..., -1:] + bg * (1 - img[..., -1:])
        depth, _ = read_pfm(scene_info["depth_paths"][idx])
        if depth.ndim == 3:
            depth = depth[..., 0]
        return img.astype(np.float32), mask, depth.astype(np.float32)

    def __getitem__(self, index: int) -> dict:
        scene_name = str(self.scenes_name[index])
        info = self.scene_infos[scene_name]

        if self.split == "train":
            views = [int(self.rng.choice(info["groups"][i]))
                     for i in self.rng.permutation(self.n_group)]
            views += [int(self.rng.choice(info["groups"][i]))
                      for i in self.rng.permutation(self.n_group)]
        else:
            views = [int(info["groups"][i][0]) for i in range(self.n_group)]
            views += [int(info["groups_4"][i][-1]) for i in range(4)]

        bg = np.ones(3, np.float32)
        imgs, deps, msks, c2ws, w2cs, ixts = [], [], [], [], [], []
        for idx in views:
            img, msk, dep = self._read_image(info, idx, bg)
            imgs.append(img)
            msks.append(msk)
            deps.append(dep)
            c2ws.append(info["c2ws"][idx])
            w2cs.append(info["w2cs"][idx])
            ixt = info["ixts"][idx].copy()
            ixt[:2] = ixt[:2] * self.img_downscale.reshape(2, 1)
            ixts.append(ixt)

        tar_c2ws, tar_w2cs = np.stack(c2ws), np.stack(w2cs)
        tar_ixts = np.stack(ixts)
        tar_c2ws, tar_w2cs, transform_mats = canonicalize_cameras_np(tar_c2ws, tar_w2cs)

        H, W = int(self.img_size[1]), int(self.img_size[0])
        ret = {
            "fovx": np.float32(info["fovx"][views[0]]),
            "fovy": np.float32(info["fovy"][views[0]]),
            "tar_c2w": tar_c2ws,
            "tar_w2c": tar_w2cs,
            "tar_ixt": tar_ixts,
            "tar_rgb": np.stack(imgs),
            "tar_dep": np.stack(deps),
            "tar_msk": np.stack(msks),
            "bg_color": np.tile(bg[None], (len(views), 1)),
            "transform_mats": transform_mats,
            "near_far": np.array([0.5, 2.5], np.float32),
            "meta": {"scene": scene_name, "tar_view": views, "tar_h": H, "tar_w": W},
        }
        ret["tar_rays"] = build_rays_np(tar_c2ws, tar_ixts, H, W, 1.0)
        ret["tar_rays_down"] = build_rays_np(tar_c2ws, tar_ixts, H, W, 1.0 / 16)
        return ret
