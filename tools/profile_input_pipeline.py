#!/usr/bin/env python
"""Host input-pipeline throughput at the production training shape
(VERDICT r3 item 6 / SURVEY §7 risk (e)).

Measures scenes/sec delivered by the threaded DataLoader + native decode
kernels from a gzip'd 512² gobjaverse-schema HDF5 shard (the production
format: tools/prepare_gobjaverse.py gzips every image), at the training
batch shape (batch 3 × 8 views of 512² RGBA + normals + full/16 ray
grids), across a worker-count sweep. The reference feeds 4 GPUs from 8
torch DataLoader worker processes per rank (train_lightning.py:35-45);
here the bar is the measured TPU train-step rate (3 scenes / step_s).

Usage: python tools/profile_input_pipeline.py [--workers 1 2 4 8 16]
The shard is generated once into /tmp and reused.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def ensure_shard(path: str, n_scenes: int, img: int) -> str:
    from lara_tpu.data.synthetic import write_synthetic_h5

    if not os.path.exists(path):
        t0 = time.perf_counter()
        write_synthetic_h5(path, n_scenes=n_scenes, n_views=12,
                           img_size=(img, img), compression="gzip")
        print(f"# generated {path} ({n_scenes} scenes @ {img}² gzip) "
              f"in {time.perf_counter() - t0:.1f}s", flush=True)
    return path


def measure(path: str, workers: int, batch: int, n_group: int,
            epochs: int = 2) -> float:
    """Scenes/sec sustained over `epochs` full passes.

    The first `prefetch + 1` batches are excluded from the clock: they were
    decoded during thread spin-up and sit ready in the prefetch queue, so
    counting them measures queue drain, not pipeline throughput (with a
    24-scene shard and one epoch that inflated the rate ~1000×)."""
    from lara_tpu.config import DatasetConfig
    from lara_tpu.data.gobjverse import GObjaverseDataset
    from lara_tpu.data.loader import DataLoader

    prefetch = 4
    cfg = DatasetConfig(data_root=path, split="train", n_group=n_group,
                        img_size=(512, 512), load_normal=True, n_scenes=10**6)
    ds = GObjaverseDataset(cfg)
    dl = DataLoader(ds, batch_size=batch, shuffle=True, num_workers=workers,
                    prefetch=prefetch)
    n_scenes = 0
    skip = prefetch + 1
    t0 = None
    for ep in range(epochs):
        dl.set_epoch(ep)
        for b in dl:
            if skip:             # spin-up: already sitting in the queue
                skip -= 1
                t0 = time.perf_counter()
                continue
            n_scenes += b["tar_rgb"].shape[0]
    if not n_scenes:
        raise ValueError("shard too small: every batch fit the prefetch "
                         "queue — raise epochs/n_scenes")
    dt = time.perf_counter() - t0
    return n_scenes / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, nargs="*", default=[1, 2, 4, 8, 16])
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--n-group", type=int, default=4)
    ap.add_argument("--train-step-s", type=float, default=None,
                    help="measured TPU step time to compare against")
    a = ap.parse_args()

    path = f"/tmp/lara_input_bench_{a.img}.h5"
    ensure_shard(path, a.scenes, a.img)
    sz = os.path.getsize(path) / 1e6
    print(f"# shard: {a.scenes} scenes × 12 views @ {a.img}² gzip "
          f"({sz:.0f} MB); batch {a.batch} × {2 * a.n_group} views")
    best = 0.0
    for w in a.workers:
        sps = measure(path, w, a.batch, a.n_group)
        best = max(best, sps)
        line = f"workers={w:3d}  {sps:6.2f} scenes/s"
        if a.train_step_s:
            need = a.batch / a.train_step_s
            line += (f"   ({sps / need:4.1f}× the TPU consumption rate "
                     f"{need:.2f} scenes/s)")
        print(line, flush=True)
    print(f"best: {best:.2f} scenes/s")


if __name__ == "__main__":
    main()
