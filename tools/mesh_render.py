#!/usr/bin/env python
"""Mesh turntable rendering (CPU stand-in for the reference's Mitsuba path
tracer, tools/meshRender.py — Mitsuba's cuda_ad_rgb variant is unavailable
here). Renders a triangle mesh with a z-buffered Lambertian shader on the
standard 3-elevation orbit and writes an mp4."""

from __future__ import annotations

import argparse

import numpy as np


def load_obj(path: str):
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                faces.append([int(t.split("/")[0]) - 1 for t in line.split()[1:4]])
    return np.array(verts, np.float32), np.array(faces, np.int64)


def render_mesh_view(verts, faces, c2w, ixt, H, W, light=(0.4, 0.7, -0.6)):
    """Painter-free z-buffer rasterization of triangles, Lambert shading."""
    w2c = np.linalg.inv(c2w)
    cam = verts @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    uv = cam[:, :2] / np.maximum(z[:, None], 1e-6)
    px = ixt[0, 0] * uv[:, 0] + ixt[0, 2]
    py = ixt[1, 1] * uv[:, 1] + ixt[1, 2]

    tri = faces
    v0, v1, v2 = verts[tri[:, 0]], verts[tri[:, 1]], verts[tri[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    light = np.asarray(light) / np.linalg.norm(light)
    shade = np.abs(n @ light) * 0.75 + 0.25

    img = np.ones((H, W, 3), np.float32)
    zbuf = np.full((H, W), np.inf, np.float32)
    # simple per-triangle scanline; fine for turntable previews
    x = np.stack([px[tri[:, i]] for i in range(3)], 1)
    y = np.stack([py[tri[:, i]] for i in range(3)], 1)
    zt = np.stack([z[tri[:, i]] for i in range(3)], 1).mean(1)
    order = np.argsort(-zt)  # far to near
    for t in order:
        if zt[t] <= 0:
            continue
        xs, ys = x[t], y[t]
        x0, x1c = int(max(xs.min(), 0)), int(min(xs.max(), W - 1)) + 1
        y0, y1c = int(max(ys.min(), 0)), int(min(ys.max(), H - 1)) + 1
        if x0 >= x1c or y0 >= y1c:
            continue
        gy, gx = np.mgrid[y0:y1c, x0:x1c]
        d = _barycentric_inside(xs, ys, gx + 0.5, gy + 0.5)
        mask = d & (zt[t] < zbuf[y0:y1c, x0:x1c])
        zbuf[y0:y1c, x0:x1c][mask] = zt[t]
        img[y0:y1c, x0:x1c][mask] = shade[t]
    return img


def _barycentric_inside(xs, ys, gx, gy):
    d = (ys[1] - ys[2]) * (xs[0] - xs[2]) + (xs[2] - xs[1]) * (ys[0] - ys[2])
    if abs(d) < 1e-12:
        return np.zeros_like(gx, bool)
    a = ((ys[1] - ys[2]) * (gx - xs[2]) + (xs[2] - xs[1]) * (gy - ys[2])) / d
    b = ((ys[2] - ys[0]) * (gx - xs[2]) + (xs[0] - xs[2]) * (gy - ys[2])) / d
    c = 1 - a - b
    return (a >= 0) & (b >= 0) & (c >= 0)


def main():
    import cv2

    from lara_tpu.eval.video_path import uni_mesh_path

    ap = argparse.ArgumentParser()
    ap.add_argument("mesh")
    ap.add_argument("--out", default="mesh_video.mp4")
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    verts, faces = load_obj(args.mesh)
    cams = uni_mesh_path(16, "gobjeverse", (args.size, args.size))
    wr = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"), 15,
                         (args.size, args.size))
    for cam in cams:
        img = render_mesh_view(verts, faces, cam.c2w, cam.ixt,
                               args.size, args.size)
        wr.write((img[..., ::-1] * 255).astype(np.uint8))
    wr.release()
    print("->", args.out)


if __name__ == "__main__":
    main()
