#!/usr/bin/env python
"""Sweep the Pallas blend chunk size (entries per inner kernel step) at the
production rasterizer workload, fwd and fwd+bwd.

The chunk trades while-loop iteration count (scalar-core sync overhead)
against early-exit granularity and the [C,C]x[C,P] cumsum matmul shape:
chunk=128 runs ONE iteration per tile budget but composites entries the
64-chunk walk would have early-exited past; chunk=32 exits earlier but
doubles loop iterations and halves the MXU matmul size.

Usage: python tools/sweep_chunk.py [--chunks 32,64,128]
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")

from ab_kernels_common import make_timed_render  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="32,64,128")
    ap.add_argument("--trials", type=int, default=3)
    a = ap.parse_args()

    timed, base = make_timed_render(trials=a.trials)
    print(f"{'chunk':>6s} {'fwd ms':>8s} {'fps':>7s} {'f+b ms':>8s} {'fps':>7s}")
    for chunk in (int(c) for c in a.chunks.split(",")):
        if base.tile_budget % chunk:
            print(f"{chunk:6d} skipped (budget {base.tile_budget} % chunk)")
            continue
        cfg = dataclasses.replace(base, pallas_chunk=chunk)
        try:
            t_f, t_fb = timed(cfg)
            print(f"{chunk:6d} {t_f * 1e3:8.2f} {1 / t_f:7.1f} "
                  f"{t_fb * 1e3:8.2f} {1 / t_fb:7.1f}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"{chunk:6d} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
