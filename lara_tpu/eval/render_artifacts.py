"""Orbit video rendering + TSDF mesh extraction from a surfel set.

Counterpart of evaluation.py:118-155 + tools/meshExtractor.py: render the
canonical orbit (120 frames default) to an mp4, and fuse 48 orbit
depth/color renders into a TSDF → marching-tetrahedra mesh with
largest-cluster cleanup.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from lara_tpu.config import Config
from lara_tpu.eval.tsdf import TSDFVolume, keep_largest_clusters, save_obj
from lara_tpu.eval.video_path import uni_mesh_path, uni_video_path
from lara_tpu.models.lara import make_cameras
from lara_tpu.ops.rasterizer import RasterizeConfig
from lara_tpu.ops.rasterizer.api import resolve_backend
from lara_tpu.ops.renderer import render_view


def _render_frames(cams, gauss, cfg: Config, img_size: Tuple[int, int]):
    import jax
    import jax.numpy as jnp

    centers, shs, op, sc, rot = gauss
    W, H = img_size
    rcfg = RasterizeConfig(
        height=H, width=W, tile=cfg.render.tile, dup=cfg.render.dup,
        tile_budget=cfg.render.eval_tile_budget, tile_chunk=cfg.render.tile_chunk,
        sh_degree=cfg.model.sh_degree, backend=resolve_backend(cfg.render.backend))
    bg = jnp.ones(3)

    @jax.jit
    def render_one(c2w, fovx, fovy, near, far):
        cam = make_cameras(c2w, fovx, fovy, near, far)
        return render_view(cam, None, centers, shs, op, sc, rot, bg, rcfg)

    frames = []
    for c in cams:
        f = render_one(jnp.asarray(c.c2w), jnp.asarray(c.fovx), jnp.asarray(c.fovy),
                       jnp.asarray(c.znear), jnp.asarray(c.zfar))
        frames.append({k: np.asarray(v) for k, v in f.items()})
    return frames


def render_video(path: str, gauss, cfg: Config, transform_mats,
                 n_frames: int = 120, fps: int = 30, sample=None):
    """`sample` (optional): the batch dict of the scene being rendered —
    required for mipnerf360, whose LLFF spiral is built from the sample's
    poses (tar_c2w) and depth bounds (near_far)."""
    img_size = tuple(cfg.infer_dataset.img_size)
    c2ws = near_fars = sample_fov = None
    if sample is not None:
        c2ws = np.asarray(sample["tar_c2w"]).reshape(-1, 4, 4)
        near_fars = np.asarray(sample["near_far"])
        sample_fov = (float(np.ravel(sample["fovx"])[0]),
                      float(np.ravel(sample["fovy"])[0]))
    name = cfg.infer_dataset.dataset_name
    cams = uni_video_path(n_frames, name, img_size, transform_mats,
                          fov=sample_fov if name in ("mipnerf360", "mipnerf")
                          else None,
                          c2ws=c2ws, near_fars=near_fars)
    frames = _render_frames(cams, gauss, cfg, img_size)
    rgb = [(np.clip(f["image"], 0, 1) * 255).astype(np.uint8) for f in frames]

    # cv2's built-in encoder (no ffmpeg in this environment); GIF fallback.
    import cv2

    h, w = rgb[0].shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if writer.isOpened():
        for fr in rgb:
            writer.write(fr[..., ::-1])
        writer.release()
        return path
    import imageio

    gif = path.rsplit(".", 1)[0] + ".gif"
    imageio.mimsave(gif, rgb, duration=1.0 / fps)
    return gif


def extract_mesh(path: str, gauss, cfg: Config, transform_mats,
                 n_views: int = 16, voxel_size: float = 2 / 256,
                 sdf_trunc: float = 0.08, alpha_thres: float = 0.08,
                 depth_trunc: float = 10.0):
    """48 orbit renders (3 elevations × 16) → TSDF → cleaned mesh .obj
    (tools/meshExtractor.py:51-135 defaults)."""
    img_size = tuple(cfg.infer_dataset.img_size)
    cams = uni_mesh_path(n_views, cfg.infer_dataset.dataset_name, img_size,
                         transform_mats)
    frames = _render_frames(cams, gauss, cfg, img_size)

    vol = TSDFVolume(np.array([[-0.55, -0.55, -0.55], [0.55, 0.55, 0.55]]),
                     voxel_size=voxel_size, sdf_trunc=sdf_trunc)
    for cam, f in zip(cams, frames):
        depth = f["depth"][..., 0].copy()
        depth[f["acc_map"] < alpha_thres] = 0.0
        w2c = np.linalg.inv(cam.c2w)
        vol.integrate(depth.astype(np.float32),
                      np.clip(f["image"], 0, 1).astype(np.float32),
                      cam.ixt, w2c, depth_trunc=depth_trunc)

    v, c, t = vol.extract_mesh()
    v, c, t = keep_largest_clusters(v, c, t, keep=10)
    save_obj(path, v, t, c)
    return path
