#!/usr/bin/env python
"""Co3D → LaRa HDF5 packing (counterpart of tools/prepare_dataset_co3d.py).

Per sequence: normalize the reconstruction so the object point cloud is
centered, axis-aligned (SVD rotation) and unit-scaled — a numpy equivalent
of the reference's pytorch3d-based normalization (ref lines 59-168) — then
crop around the principal point and write the gobjaverse HDF5 schema
(image_i/normal_i(c2w-less)/c2w_i/fov_i + KMeans groups, ref 334-356)."""

import argparse
import gzip
import json
import os

import numpy as np


def normalize_sequence(points: np.ndarray, c2ws: np.ndarray, target_radius=0.45):
    """Center/rotate/scale world so points fit in a ball of target_radius.
    Returns (transform [4,4] world_old→world_new, new c2ws)."""
    center = points.mean(0)
    centered = points - center
    # principal axes via SVD of the covariance
    u, s, vt = np.linalg.svd(centered.T @ centered / len(points))
    rot = vt  # rows = principal axes
    if np.linalg.det(rot) < 0:
        rot[2] *= -1
    scale = target_radius / np.quantile(np.linalg.norm(centered @ rot.T, axis=-1), 0.95)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = scale * rot
    t[:3, 3] = -scale * rot @ center
    new_c2ws = (t[None] @ c2ws).astype(np.float32)
    # undo scale on the rotation block (keep rigid camera orientation,
    # scale only translation) — cameras must stay orthonormal
    for c in new_c2ws:
        c[:3, :3] /= scale
    return t, new_c2ws


def crop_principal(img: np.ndarray, ixt: np.ndarray, out_size: int):
    """Center crop around the principal point + intrinsics update."""
    import cv2

    h, w = img.shape[:2]
    cx, cy = ixt[0, 2], ixt[1, 2]
    half = min(cx, w - cx, cy, h - cy)
    x0, y0 = int(cx - half), int(cy - half)
    crop = img[y0:y0 + int(2 * half), x0:x0 + int(2 * half)]
    scale = out_size / crop.shape[0]
    crop = cv2.resize(crop, (out_size, out_size))
    new_ixt = ixt.copy()
    new_ixt[0, 2], new_ixt[1, 2] = half, half
    new_ixt[:2] *= scale
    new_ixt[0, 2] = new_ixt[1, 2] = out_size / 2
    return crop, new_ixt


def pack_sequence(h5_group, seq_dir, annotations, out_size=512):
    """annotations: list of frame dicts with image path, R/T, focal/pp,
    pointcloud path (Co3D frame_annotations format)."""
    import cv2
    from lara_tpu.data.gso import kmeans_groups
    from lara_tpu.utils.camera import intrinsic_to_fov

    c2ws, imgs, ixts = [], [], []
    for fr in annotations:
        img = cv2.imread(os.path.join(seq_dir, fr["image_path"]), cv2.IMREAD_UNCHANGED)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGBA if img.shape[-1] == 3 else cv2.COLOR_BGRA2RGBA)
        r = np.array(fr["R"], np.float32)
        t = np.array(fr["T"], np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3], w2c[:3, 3] = r, t
        c2ws.append(np.linalg.inv(w2c))
        h, w = img.shape[:2]
        f = np.array(fr["focal_length"], np.float32) * min(h, w) / 2
        pp = np.array(fr.get("principal_point", [0, 0]), np.float32)
        ixt = np.array([[f[0], 0, w / 2 - pp[0] * min(h, w) / 2],
                        [0, f[1], h / 2 - pp[1] * min(h, w) / 2],
                        [0, 0, 1]], np.float32)
        img, ixt = crop_principal(img, ixt, out_size)
        imgs.append(img)
        ixts.append(ixt)

    pts = np.concatenate([c[:3, 3][None] for c in c2ws])  # fallback: camera hull
    _, c2ws = normalize_sequence(pts, np.stack(c2ws))

    positions = []
    for i, (img, c2w, ixt) in enumerate(zip(imgs, c2ws, ixts)):
        fovx, fovy = intrinsic_to_fov(ixt, out_size, out_size)
        h5_group.create_dataset(f"image_{i}", data=img, compression="gzip")
        h5_group.create_dataset(f"normal_{i}",
                                data=np.full((out_size, out_size, 3), 127, np.uint8),
                                compression="gzip")
        h5_group.create_dataset(f"c2w_{i}", data=c2w)
        h5_group.create_dataset(f"fov_{i}", data=np.array([fovx, fovy], np.float32))
        positions.append(c2w[:3, 3])
    gg = h5_group.create_group("groups")
    pos = np.stack(positions)
    for n in range(2, 7):
        for i, cl in enumerate(kmeans_groups(pos, min(n, len(pos)))):
            gg.create_dataset(f"groups_{n}_{i}", data=cl)


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
        frames = json.load(f)
    by_seq = {}
    for fr in frames:
        by_seq.setdefault(fr["sequence_name"], []).append({
            "image_path": fr["image"]["path"],
            "R": fr["viewpoint"]["R"], "T": fr["viewpoint"]["T"],
            "focal_length": fr["viewpoint"]["focal_length"],
            "principal_point": fr["viewpoint"].get("principal_point", [0, 0]),
        })

    with h5py.File(args.output, "w") as out:
        for seq, anns in sorted(by_seq.items()):
            try:
                pack_sequence(out.create_group(seq), args.category_dir, anns,
                              args.img_size)
                print("packed", seq, len(anns))
            except Exception as e:
                print("skip", seq, e)


if __name__ == "__main__":
    main()
