#!/usr/bin/env python
"""Benchmark suite runner (counterpart of eval_all.py): runs evaluate.py
over the standard benchmark configs — GSO, gobjaverse-test, Co3D teddybear
and hydrant — as subprocesses, one JSON per benchmark in outputs/metrics."""

import os
import subprocess
import sys

CKPT = sys.argv[1] if len(sys.argv) > 1 else "ckpts/latest"
PY = sys.executable

RUNS = [
    # (name, extra overrides) — mirrors /root/reference/eval_all.py:7-34
    ("GSO", [
        "infer_dataset.dataset_name=GSO",
        "infer_dataset.data_root=dataset/google_scanned_objects",
        "infer.eval_depth=[0.005,0.01,0.02]",
    ]),
    ("gobjeverse", [
        "infer_dataset.dataset_name=gobjeverse",
        "infer_dataset.data_root=dataset/gobjaverse/gobjaverse.h5",
        "infer_dataset.split=test",
    ]),
    ("co3d_teddybear", [
        "infer_dataset.dataset_name=gobjeverse",
        "infer_dataset.data_root=dataset/co3d_teddybear.h5",
    ]),
    ("co3d_hydrant", [
        "infer_dataset.dataset_name=gobjeverse",
        "infer_dataset.data_root=dataset/co3d_hydrant.h5",
    ]),
]


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for n_views in (4,):
        for name, overrides in RUNS:
            cmd = [PY, os.path.join(here, "evaluate.py"),
                   f"n_views={n_views}",
                   f"infer.ckpt_path={CKPT}",
                   f"infer.metric_path=outputs/metrics/{name}",
                   *overrides]
            print("+", " ".join(cmd))
            ret = subprocess.call(cmd)
            if ret != 0:
                print(f"[eval_all] {name} failed with code {ret}")


if __name__ == "__main__":
    main()
