#!/usr/bin/env python
"""Run ONLY bench.py's flagship train-step measurement (B=3, 4+4 views,
512²) — for A/B-ing train-step levers (LARA_REMAT_SAVE, LARA_FLASH,
LARA_REMAT_POLICY env overrides) without re-timing the rasterizer legs.

Usage: LARA_REMAT_SAVE=bin,packed,entries,stash python tools/bench_train_only.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lara_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    import bench

    t, mfu, flops, a_mfu, a_flops = bench.bench_train_step()
    print(json.dumps({
        "train_step_s": round(t, 3),
        "train_mfu": round(a_mfu, 4),
        "remat_save": os.environ.get("LARA_REMAT_SAVE", "<default>"),
        "flash": os.environ.get("LARA_FLASH", ""),
        "remat_policy": os.environ.get("LARA_REMAT_POLICY", ""),
    }))


if __name__ == "__main__":
    main()
