#!/usr/bin/env python
"""Offline converter: torchvision VGG16 + lpips linear weights → .npz for
lara_tpu.eval.lpips (run on a machine with the torch checkpoints available).

Usage:
    python tools/convert_lpips.py vgg16.pth lpips_vgg_lins.pth weights/lpips_vgg.npz
"""

import sys

import numpy as np


def main(vgg_path, lin_path, out_path):
    import torch

    vgg_state = torch.load(vgg_path, map_location="cpu")
    lin_state = torch.load(lin_path, map_location="cpu")

    arrays = {}
    conv_i = 0
    for idx in sorted({int(k.split(".")[1]) for k in vgg_state
                       if k.startswith("features.") and k.endswith(".weight")}):
        w = vgg_state[f"features.{idx}.weight"].numpy().astype(np.float32)
        b = vgg_state[f"features.{idx}.bias"].numpy().astype(np.float32)
        arrays[f"vgg_w{conv_i}"] = w.transpose(2, 3, 1, 0)
        arrays[f"vgg_b{conv_i}"] = b
        conv_i += 1
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        arrays[f"lin{i}"] = lin_state[key].numpy().astype(np.float32).reshape(-1)
    np.savez(out_path, **arrays)
    print(f"wrote {out_path} ({conv_i} conv layers)")


if __name__ == "__main__":
    main(*sys.argv[1:4])
