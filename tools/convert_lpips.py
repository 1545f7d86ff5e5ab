#!/usr/bin/env python
"""Offline converter: torchvision VGG16/AlexNet + lpips linear weights →
.npz for lara_tpu.eval.lpips (run on a machine with the torch checkpoints
available; the reference evaluates both nets, evaluation.py:48-49).

Usage:
    python tools/convert_lpips.py vgg16.pth  lpips_vgg_lins.pth  weights/lpips_vgg.npz  [vgg]
    python tools/convert_lpips.py alexnet.pth lpips_alex_lins.pth weights/lpips_alex.npz alex
"""

import sys

import numpy as np


def main(backbone_path, lin_path, out_path, net="vgg"):
    import torch

    state = torch.load(backbone_path, map_location="cpu")
    lin_state = torch.load(lin_path, map_location="cpu")

    arrays = {}
    conv_i = 0
    for idx in sorted({int(k.split(".")[1]) for k in state
                       if k.startswith("features.") and k.endswith(".weight")}):
        w = state[f"features.{idx}.weight"].numpy().astype(np.float32)
        b = state[f"features.{idx}.bias"].numpy().astype(np.float32)
        arrays[f"{net}_w{conv_i}"] = w.transpose(2, 3, 1, 0)
        arrays[f"{net}_b{conv_i}"] = b
        conv_i += 1
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        arrays[f"lin{i}"] = lin_state[key].numpy().astype(np.float32).reshape(-1)
    np.savez(out_path, **arrays)
    print(f"wrote {out_path} ({net}: {conv_i} conv layers)")


if __name__ == "__main__":
    main(*sys.argv[1:5])
