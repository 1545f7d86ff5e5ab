#!/usr/bin/env python
"""gobjaverse tar → HDF5 packing (counterpart of
tools/prepare_dataset_objaverse.py, C24).

Per scene: 38 of 40 views kept (views 25/26 — the top-down pair — skipped,
reference lines 29-31), per-view datasets `image_i` (RGBA u8, gzip),
`normal_i` (u8, EXR-decoded world normals remapped (x,-z,y) → u8), `c2w_i`,
`fov_i`, plus KMeans view-position clusters `groups_{n}_{i}` for n in 2..6
(reference lines 133-152). Multiprocess sharding + shard merge via
tools/hdf5_split_merge.py.
"""

import argparse
import json
import os
import tarfile
from multiprocessing import Pool

import numpy as np

SKIP_VIEWS = (25, 26)
N_VIEWS = 40


def kmeans_groups(xyz, n_clusters):
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=n_clusters, n_init=10, random_state=20211202).fit(xyz)
    return [np.where(km.labels_ == i)[0].astype(np.uint8) for i in range(n_clusters)]


def decode_view(tar, scene, idx):
    """Read one view's png + exr-normal + json from an extracted scene dir."""
    import cv2

    base = os.path.join(scene, f"{idx:05d}")
    rgba = cv2.imread(base + ".png", cv2.IMREAD_UNCHANGED)
    rgba = cv2.cvtColor(rgba, cv2.COLOR_BGRA2RGBA)

    meta = json.load(open(base + ".json"))
    c2w = np.array(meta["transform_matrix"], np.float32)
    fov = np.array([meta["x_fov"], meta["y_fov"]], np.float32)

    normal = None
    exr_path = base + "_nd.exr"
    if os.path.exists(exr_path):
        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        nd = cv2.imread(exr_path, cv2.IMREAD_UNCHANGED)
        if nd is not None:
            n = nd[..., :3].astype(np.float32)
            # world normal axis remap (reference lines 102-109): (x, -z, y)
            n = np.stack([n[..., 0], -n[..., 2], n[..., 1]], -1)
            normal = ((n * 0.5 + 0.5) * 255).astype(np.uint8)
    if normal is None:
        normal = np.full(rgba.shape[:2] + (3,), 127, np.uint8)
    return rgba, normal, c2w, fov


def pack_scene(h5_group, scene_dir):
    positions = []
    kept = [i for i in range(N_VIEWS) if i not in SKIP_VIEWS]
    for out_i, idx in enumerate(kept):
        rgba, normal, c2w, fov = decode_view(None, scene_dir, idx)
        # whole-image chunks → single read_direct_chunk + libdeflate inflate
        # per view at load time (lara_tpu.data.native.h5_read)
        h5_group.create_dataset(f"image_{out_i}", data=rgba,
                                compression="gzip", chunks=rgba.shape)
        h5_group.create_dataset(f"normal_{out_i}", data=normal,
                                compression="gzip", chunks=normal.shape)
        h5_group.create_dataset(f"c2w_{out_i}", data=c2w)
        h5_group.create_dataset(f"fov_{out_i}", data=fov)
        positions.append(c2w[:3, 3])
    gg = h5_group.create_group("groups")
    pos = np.stack(positions)
    for n in range(2, 7):
        for i, cl in enumerate(kmeans_groups(pos, n)):
            gg.create_dataset(f"groups_{n}_{i}", data=cl)


def process_shard(args):
    shard_id, scene_dirs, out_dir = args
    import h5py

    out = os.path.join(out_dir, f"gobjaverse_part_{shard_id}.h5")
    with h5py.File(out, "w") as f:
        for scene_dir in scene_dirs:
            name = os.path.basename(scene_dir.rstrip("/"))
            try:
                pack_scene(f.create_group(name), scene_dir)
            except Exception as e:
                print(f"[shard {shard_id}] skipping {name}: {e}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True,
                    help="directory of extracted per-scene folders")
    ap.add_argument("--output_dir", default="dataset/gobjaverse")
    ap.add_argument("--num_shards", type=int, default=8)
    ap.add_argument("--merge", action="store_true",
                    help="merge shards into gobjaverse.h5 afterwards")
    args = ap.parse_args()

    scenes = sorted(
        os.path.join(args.input_dir, d) for d in os.listdir(args.input_dir)
        if os.path.isdir(os.path.join(args.input_dir, d)))
    os.makedirs(args.output_dir, exist_ok=True)
    shards = [(i, scenes[i::args.num_shards], args.output_dir)
              for i in range(args.num_shards)]
    with Pool(args.num_shards) as pool:
        outs = pool.map(process_shard, shards)
    print("shards:", outs)
    if args.merge:
        from tools.hdf5_split_merge import merge_hdf5_files

        merge_hdf5_files(outs, os.path.join(args.output_dir, "gobjaverse.h5"))


if __name__ == "__main__":
    main()
