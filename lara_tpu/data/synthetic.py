"""Synthetic scene generation: analytic shaded spheres in the gobjaverse HDF5
schema, for end-to-end tests and benchmarking without the 280k-scene dataset
(SURVEY.md §4 item (e))."""

from __future__ import annotations

import numpy as np

from lara_tpu.config import DatasetConfig
from lara_tpu.data.gobjverse import GObjaverseDataset
from lara_tpu.utils.camera import build_rays_np, fov_to_ixt


def _orbit_c2w(radius, azim, elev):
    eye = np.array([
        radius * np.cos(elev) * np.sin(azim),
        radius * np.sin(elev),
        -radius * np.cos(elev) * np.cos(azim),
    ], np.float32)
    z = -eye / np.linalg.norm(eye)
    x = np.cross(np.array([0.0, 1.0, 0.0], np.float32), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


def render_spheres(c2w, ixt, H, W, spheres):
    """Analytic lambertian render of spheres [(center, radius, albedo)].
    Returns rgba [H, W, 4] u8 and normal [H, W, 3] u8."""
    rays = build_rays_np(c2w[None], ixt[None], H, W, 1.0)[0]
    o, d = rays[..., :3], rays[..., 3:]
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    light = np.array([0.5, 0.8, -0.3])
    light = light / np.linalg.norm(light)

    best_t = np.full((H, W), np.inf, np.float32)
    rgb = np.zeros((H, W, 3), np.float32)
    nrm = np.zeros((H, W, 3), np.float32)
    for center, radius, albedo in spheres:
        oc = o - center
        b = np.sum(oc * d, -1)
        c = np.sum(oc * oc, -1) - radius * radius
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        hit &= (t > 0) & (t < best_t)
        p = o + t[..., None] * d
        n = (p - center) / radius
        shade = np.clip(n @ light, 0, 1) * 0.8 + 0.2
        col = np.asarray(albedo)[None, None] * shade[..., None]
        rgb = np.where(hit[..., None], col, rgb)
        nrm = np.where(hit[..., None], n, nrm)
        best_t = np.where(hit, t, best_t)

    alpha = (np.isfinite(best_t)).astype(np.float32)
    rgba = np.concatenate([rgb, alpha[..., None]], -1)
    return (np.clip(rgba, 0, 1) * 255).astype(np.uint8), \
        ((nrm * 0.5 + 0.5) * 255).astype(np.uint8)


def write_synthetic_h5(path: str, n_scenes: int = 4, n_views: int = 12,
                       img_size=(64, 64), radius: float = 1.8, seed: int = 0,
                       compression=None):
    """Write an HDF5 shard in the gobjaverse schema
    (tools/prepare_dataset_objaverse.py:133-152): image_i/normal_i/c2w_i/fov_i
    plus KMeans-style view groups groups_{n}_{i} for n in 2..6.
    `compression="gzip"` matches the production shards (the prep tool
    gzips every image/normal dataset) for input-pipeline benchmarking;
    tests default to uncompressed for speed."""
    import h5py

    rng = np.random.default_rng(seed)
    W, H = img_size
    fov = np.array([0.69, 0.69], np.float32)  # ~40°, gobjaverse-like
    ixt = fov_to_ixt(fov, np.array([W, H]))

    with h5py.File(path, "w") as f:
        for s in range(n_scenes):
            g = f.create_group(f"scene_{s:04d}")
            n_sph = rng.integers(2, 5)
            spheres = [
                (rng.uniform(-0.25, 0.25, 3).astype(np.float32),
                 float(rng.uniform(0.1, 0.3)),
                 rng.uniform(0.2, 1.0, 3).astype(np.float32))
                for _ in range(n_sph)
            ]
            azims = np.linspace(0, 2 * np.pi, n_views, endpoint=False)
            elevs = rng.uniform(-0.3, 0.5, n_views)
            for i in range(n_views):
                c2w = _orbit_c2w(radius, azims[i], elevs[i])
                rgba, normal = render_spheres(c2w, ixt, H, W, spheres)
                # whole-image chunks: one read_direct_chunk + one libdeflate
                # inflate per view (lara_tpu.data.native.h5_read fast path)
                g.create_dataset(f"image_{i}", data=rgba,
                                 compression=compression,
                                 chunks=rgba.shape if compression else None)
                g.create_dataset(f"normal_{i}", data=normal,
                                 compression=compression,
                                 chunks=normal.shape if compression else None)
                g.create_dataset(f"c2w_{i}", data=c2w)
                g.create_dataset(f"fov_{i}", data=fov)
            gg = g.create_group("groups")
            for n in range(2, 7):
                # contiguous azimuth clusters stand in for KMeans groups
                splits = np.array_split(np.arange(n_views), n)
                for i, cl in enumerate(splits):
                    gg.create_dataset(f"groups_{n}_{i}", data=cl.astype(np.uint8))
    return path


class SyntheticDataset(GObjaverseDataset):
    """gobjaverse-schema dataset backed by a generated HDF5 (creates the shard
    on first use if data_root is missing)."""

    def __init__(self, cfg: DatasetConfig, rng=None):
        import os

        if not os.path.exists(cfg.data_root):
            os.makedirs(os.path.dirname(cfg.data_root) or ".", exist_ok=True)
            write_synthetic_h5(cfg.data_root, n_scenes=max(4, min(cfg.n_scenes, 256)),
                               img_size=tuple(cfg.img_size))
        super().__init__(cfg, rng=rng)
