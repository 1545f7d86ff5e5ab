"""gobjaverse HDF5 dataset (counterpart of dataLoader/gobjverse.py).

Scene schema (written by tools/prepare_dataset_objaverse.py in the reference,
reproduced by our tools/prepare_gobjaverse.py): per-scene HDF5 group with
`image_{i}` [H,W,4] u8, `normal_{i}` [H,W,3] u8, `c2w_{i}` [4,4] f32,
`fov_{i}` [2] f32 and a `groups` subgroup with KMeans view clusters
`groups_{n}_{i}` for n in 2..6.

Emits the §1 L2 batch contract: N = 2·n_group views (first half inputs,
second half supervision), canonicalized so view 0 sits at distance r on −z,
bg-color augmentation {0, 0.5, 1} on supervision views during training.
"""

from __future__ import annotations

import threading

import numpy as np

from lara_tpu.config import DatasetConfig
from lara_tpu.utils.camera import canonicalize_cameras_np, fov_to_ixt


class GObjaverseDataset:
    def __init__(self, cfg: DatasetConfig, rng: np.random.Generator | None = None):
        self.cfg = cfg
        self.split = cfg.split
        self.img_size = np.array(cfg.img_size)
        self.n_group = cfg.n_group
        # One HDF5 handle PER THREAD: libhdf5 is not thread-safe and h5py's
        # API lock does not cover the raw-chunk read path — a shared handle
        # under the threaded loader segfaulted inside libhdf5 (round 5).
        # Handles are opened lazily on each thread's first access.
        self._h5_path = cfg.data_root
        self._h5_local = threading.local()
        scenes_name = np.array(sorted(self.metas.keys()))

        if "splits" in scenes_name:
            self.scenes_name = self.metas["splits"]["test"][:].astype(str)
        else:
            i_test = np.arange(len(scenes_name))[::10][: cfg.n_scenes]
            i_train = np.array(
                [i for i in np.arange(len(scenes_name)) if i not in i_test]
            )[: cfg.n_scenes]
            self.scenes_name = (
                scenes_name[i_train] if self.split == "train" else scenes_name[i_test]
            )
        self.rng = rng or np.random.default_rng(0)

    @property
    def metas(self):
        """This thread's HDF5 file handle (see __init__)."""
        f = getattr(self._h5_local, "f", None)
        if f is None:
            import h5py
            f = h5py.File(self._h5_path, "r")
            self._h5_local.f = f
        return f

    def __len__(self):
        return len(self.scenes_name)

    def _sample_views(self, scene_info):
        """Group-based view sampling (dataLoader/gobjverse.py:45-53): during
        training draw one random member of each of the n_group clusters for
        inputs and again for supervision; at eval use deterministic cluster
        representatives. Caller holds H5_LOCK."""
        g = scene_info["groups"]
        n = self.n_group
        if self.split == "train" and n > 1:
            perm1 = self.rng.permutation(n)
            perm2 = self.rng.permutation(n)
            src = [int(self.rng.choice(g[f"groups_{n}_{i}"][:])) for i in perm1]
            extra = [int(self.rng.choice(g[f"groups_{n}_{i}"][:])) for i in perm2]
            return src + extra
        if n == 1:
            src = [int(g["groups_4_0"][0])]
            return src + [int(g[f"groups_4_{i}"][-1]) for i in range(4)]
        src = [int(g[f"groups_{n}_{i}"][0]) for i in range(n)]
        return src + [int(g[f"groups_4_{i}"][-1]) for i in range(4)]

    def __getitem__(self, index: int) -> dict:
        from lara_tpu.data.native import (H5_LOCK, build_rays_batch,
                                          composite_rgba, decode_normal,
                                          h5_read)

        scene_name = str(self.scenes_name[index])
        with H5_LOCK:  # all libhdf5 entry points serialized (see native.py)
            scene_info = self.metas[scene_name]
            view_id = self._sample_views(scene_info)

        imgs, bg_colors, nrms, msks, c2ws, w2cs, ixts = [], [], [], [], [], [], []
        for i, idx in enumerate(view_id):
            if self.split != "train" or i < self.n_group:
                bg = np.ones(3, np.float32)
            else:
                bg = np.ones(3, np.float32) * self.rng.choice([0.0, 0.5, 1.0])
            bg_colors.append(bg)

            rgba = h5_read(scene_info[f"image_{idx}"])  # libdeflate fast path
            img, msk = composite_rgba(rgba, bg)  # fused native kernel
            imgs.append(img)
            msks.append(msk)
            if self.cfg.load_normal:
                # raw u8 — decoded+rotated in ONE native pass after the
                # canonicalization transform is known (decode_normal)
                nrms.append(h5_read(scene_info[f"normal_{idx}"]))

            with H5_LOCK:
                c2w = np.asarray(scene_info[f"c2w_{idx}"], np.float32)
                fov = np.asarray(scene_info[f"fov_{idx}"], np.float32)
            c2ws.append(c2w)
            w2cs.append(np.linalg.inv(c2w))
            ixts.append(fov_to_ixt(fov, self.img_size))

        tar_img = np.stack(imgs)
        tar_c2ws, tar_w2cs = np.stack(c2ws), np.stack(w2cs)
        tar_ixts = np.stack(ixts)

        r = np.linalg.norm(tar_c2ws[0, :3, 3])
        tar_c2ws, tar_w2cs, transform_mats = canonicalize_cameras_np(tar_c2ws, tar_w2cs)

        H, W = int(self.img_size[1]), int(self.img_size[0])
        with H5_LOCK:
            fov0 = np.asarray(scene_info["fov_0"], np.float32)
        ret = {
            "fovx": np.float32(fov0[0]),
            "fovy": np.float32(fov0[1]),
            "tar_c2w": tar_c2ws,
            "tar_w2c": tar_w2cs,
            "tar_ixt": tar_ixts,
            "tar_rgb": tar_img,
            "tar_msk": np.stack(msks),
            "transform_mats": transform_mats,
            "bg_color": np.stack(bg_colors),
            "near_far": np.array([r - 0.8, r + 0.8], np.float32),
            "meta": {"scene": scene_name, "tar_view": view_id,
                     "tar_h": H, "tar_w": W},
        }
        if self.cfg.load_normal:
            rot = np.ascontiguousarray(transform_mats[0, :3, :3], np.float32)
            ret["tar_nrm"] = np.stack([decode_normal(n, rot) for n in nrms])

        ret["tar_rays"] = build_rays_batch(tar_c2ws, tar_ixts, H, W, 1.0)
        ret["tar_rays_down"] = build_rays_batch(tar_c2ws, tar_ixts, H, W, 1.0 / 16)
        return ret
