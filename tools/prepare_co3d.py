#!/usr/bin/env python
"""Co3D → LaRa HDF5 packing (counterpart of tools/prepare_dataset_co3d.py).

Implements the reference's full "viewset-diffusion" normalization protocol
(ref lines 59-168) in NumPy — no pytorch3d dependency:
  1. translation: shift cameras + sequence point cloud so the cloud's COM is
     at the origin;
  2. rotation: SVD over the cameras' x-axes (photographer's bias) estimates
     the world up as the least-variance direction, sign-fixed against the
     first camera's y-axis; basis = [V0, up, V0×up];
  3. y-alignment + scale: center the cloud's y-extent and scale so it fits a
     cube of side `volume_side` × 0.95.
Cameras use the pytorch3d row-vector convention (x_cam = x_world @ R + T);
the HDF5 c2w conversion matches ref lines 309-320:
w2c_std = ([R 0; T 1] @ diag(-1,-1,1,1))ᵀ (pytorch3d → OpenCV axis flip).

Per frame: crop around the principal point at non-integer locations
(bilinear, ref lines 184-216), skip frames whose foreground mask covers
<10% of the crop, resize to 512, store RGBA (mask in alpha) + c2w + fov in
the gobjaverse schema with KMeans view groups (ref 334-356).
"""

import argparse
import gzip
import json
import math
import os

import numpy as np


# --------------------------------------------------------------------------
# sequence normalization (viewset-diffusion protocol, numpy)

def normalize_sequence_np(points: np.ndarray, R: np.ndarray, T: np.ndarray,
                          volume_side: float = 1.0):
    """points [P,3]; R [N,3,3], T [N,3] in pytorch3d convention
    (x_cam = x_world @ R_i + T_i). Returns normalized (R, T, points)."""
    R = R.astype(np.float64).copy()
    T = T.astype(np.float64).copy()
    points = points.astype(np.float64)

    # 1. translation: COM of the cloud to the origin
    com = points.mean(0)
    points = points - com
    T = com @ R + T            # batched row-vector shift, ref line 92

    # 2. rotation from the cameras' x-axes (columns 0 of R)
    x_vectors = R[:, :, 0].copy()
    x_vectors -= x_vectors.mean(0, keepdims=True)
    _, S, Vh = np.linalg.svd(x_vectors, full_matrices=True)
    V = Vh.T
    up = V[:, 2]
    if up @ R[0][:, 1] < 0:    # sign fix against camera 0's y (ref 110-115)
        up = -up
    basis = np.stack([V[:, 0], up, np.cross(V[:, 0], up)], axis=1)  # columns
    R = basis.T @ R
    points = points @ basis

    # 3. center the y-extent, then scale to the 0.95 cube (ref 126-140)
    ranges = points.max(0) - points.min(0)
    aligned_com = np.zeros(3)
    aligned_com[1] = points.max(0)[1] - ranges[1] / 2
    T = aligned_com @ R + T
    points = points - aligned_com
    scale = volume_side * 0.95 / (2 * np.abs(points).max())
    points = points * scale
    T = T * scale
    return R.astype(np.float32), T.astype(np.float32), points.astype(np.float32)


def p3d_to_c2w(R_i: np.ndarray, T_i: np.ndarray) -> np.ndarray:
    """pytorch3d (row-vector) camera → OpenCV-convention c2w (ref 309-320)."""
    flip = np.diag([-1.0, -1.0, 1.0, 1.0])
    w2c_row = np.eye(4)
    w2c_row[:3, :3] = R_i
    w2c_row[3, :3] = T_i
    w2c = (w2c_row @ flip).T
    return np.linalg.inv(w2c).astype(np.float32)


# --------------------------------------------------------------------------
# PLY point-cloud reader (Co3D pointcloud.ply, binary little endian)

def read_ply_points(path: str, max_points: int = 200000) -> np.ndarray:
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(l.split()[-1]) for l in header
                 if l.startswith("element vertex"))
        props = [l.split()[1:] for l in header if l.startswith("property ")
                 and "list" not in l]
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        np_t = {"float": "f4", "float32": "f4", "double": "f8",
                "uchar": "u1", "uint8": "u1", "int": "i4", "uint": "u4",
                "short": "i2", "ushort": "u2", "char": "i1"}
        dtype = np.dtype([(name, np_t[t]) for t, name in props])
        if fmt == "ascii":
            data = np.loadtxt(f, dtype=np.float64, max_rows=n)
            pts = data[:, :3]
        else:
            raw = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype, count=n)
            pts = np.stack([raw["x"], raw["y"], raw["z"]], -1).astype(np.float64)
    if len(pts) > max_points:
        idx = np.random.default_rng(0).choice(len(pts), max_points, replace=False)
        pts = pts[idx]
    return pts


# --------------------------------------------------------------------------
# image crop (non-integer principal-point crop, ref 184-216)

def crop_at_principal(img: np.ndarray, ppx: float, ppy: float,
                      max_half_side: float, out_size: int) -> np.ndarray:
    """Bilinear crop of the largest square centered at (ppx, ppy), resized to
    out_size (cv2.remap ≡ grid_sample of the reference)."""
    import cv2

    side = math.floor(2 * max_half_side)
    xs = np.linspace(ppx - max_half_side, ppx + max_half_side, side,
                     endpoint=False) + max_half_side / side
    ys = np.linspace(ppy - max_half_side, ppy + max_half_side, side,
                     endpoint=False) + max_half_side / side
    mx, my = np.meshgrid(xs.astype(np.float32), ys.astype(np.float32))
    crop = cv2.remap(img, mx, my, cv2.INTER_LINEAR)
    return cv2.resize(crop, (out_size, out_size), interpolation=cv2.INTER_AREA)


def max_box_side(h: int, w: int, ppx: float, ppy: float) -> float:
    return min(ppx, w - ppx, ppy, h - ppy)


def focal2fov(focal_px: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal_px))


# --------------------------------------------------------------------------

def pack_sequence(h5_group, category_dir, frames, pointcloud_path,
                  out_size=512, min_fg=0.1):
    import cv2

    from lara_tpu.data.gso import kmeans_groups

    R = np.stack([np.asarray(fr["R"], np.float32) for fr in frames])
    T = np.stack([np.asarray(fr["T"], np.float32) for fr in frames])
    if pointcloud_path and os.path.exists(pointcloud_path):
        pts = read_ply_points(pointcloud_path)
    else:  # fall back to the camera hull when no cloud was bundled
        pts = np.stack([-(t @ r.T) for r, t in zip(R, T)])
    R, T, _ = normalize_sequence_np(pts, R, T)

    idx = 0
    positions = []
    for i, fr in enumerate(frames):
        img = cv2.imread(os.path.join(category_dir, fr["image_path"]),
                         cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        mask = None
        if fr.get("mask_path"):
            mask = cv2.imread(os.path.join(category_dir, fr["mask_path"]),
                              cv2.IMREAD_GRAYSCALE)
        if mask is None:
            mask = np.full((h, w), 255, np.uint8)

        # pytorch3d NDC intrinsics → pixel principal point / focal
        fx_ndc, fy_ndc = np.asarray(fr["focal_length"], np.float32)
        px_ndc, py_ndc = np.asarray(fr.get("principal_point", (0.0, 0.0)),
                                    np.float32)
        half_min = min(h, w) / 2.0
        ppx = w / 2.0 - px_ndc * half_min
        ppy = h / 2.0 - py_ndc * half_min
        half = max_box_side(h, w, ppx, ppy)
        if half < 16:
            continue

        rgb = crop_at_principal(img, ppx, ppy, half, out_size)
        m = crop_at_principal(mask, ppx, ppy, half, out_size)
        if (m > 127).mean() < min_fg:  # bad segmentation (ref 286-288)
            continue
        rgba = np.concatenate([rgb, m[..., None]], -1).astype(np.uint8)

        c2w = p3d_to_c2w(R[i], T[i])
        # NDC focal scaled by the crop ratio, then to pixels (ref 325-330)
        fov = focal2fov(fx_ndc * half_min * out_size / (2 * half), out_size)
        h5_group.create_dataset(f"image_{idx}", data=rgba, compression="gzip")
        h5_group.create_dataset(f"c2w_{idx}", data=c2w)
        h5_group.create_dataset(f"fov_{idx}",
                                data=np.array([fov, fov], np.float32))
        positions.append(c2w[:3, 3])
        idx += 1

    if idx < 4:
        raise ValueError(f"only {idx} usable frames")
    gg = h5_group.create_group("groups")
    pos = np.stack(positions)
    for n in range(2, 7):
        for i, cl in enumerate(kmeans_groups(pos, min(n, len(pos)))):
            gg.create_dataset(f"groups_{n}_{i}", data=cl)
    return idx


def main():
    import h5py

    ap = argparse.ArgumentParser()
    ap.add_argument("--category_dir", required=True,
                    help="Co3D category directory with frame_annotations.jgz")
    ap.add_argument("--output", required=True)
    ap.add_argument("--img_size", type=int, default=512)
    args = ap.parse_args()

    ann_path = os.path.join(args.category_dir, "frame_annotations.jgz")
    with gzip.open(ann_path, "rt") as f:
        raw = json.load(f)
    by_seq = {}
    for fr in raw:
        by_seq.setdefault(fr["sequence_name"], []).append({
            "image_path": fr["image"]["path"],
            "mask_path": fr.get("mask", {}).get("path"),
            "R": fr["viewpoint"]["R"], "T": fr["viewpoint"]["T"],
            "focal_length": fr["viewpoint"]["focal_length"],
            "principal_point": fr["viewpoint"].get("principal_point", (0, 0)),
        })

    with h5py.File(args.output, "w") as out:
        for seq, frames in sorted(by_seq.items()):
            ply = os.path.join(args.category_dir, seq, "pointcloud.ply")
            try:
                n = pack_sequence(out.create_group(seq), args.category_dir,
                                  frames, ply, args.img_size)
                print("packed", seq, n)
            except Exception as e:
                print("skip", seq, e)


if __name__ == "__main__":
    main()
