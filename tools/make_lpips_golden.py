#!/usr/bin/env python
"""Generate the LPIPS golden fixture from the REAL torchvision/lpips
checkpoints (run offline — this container has no egress).

Pins tools/convert_lpips.py + lara_tpu.eval.lpips fidelity to the real
weights (VERDICT r4 item 9): the fixture stores the first VGG conv layer's
true weights, a deterministic input, its torch-computed relu1_1 activation,
and the full LPIPS-VGG distance of a fixed image pair. tests/test_eval.py::
test_lpips_golden_fixture replays them through the JAX stack when the
fixture is present (weights/fixtures/lpips_golden.npz) and skips otherwise.

Expected source checkpoints (sha256-pin them when you run this):
  vgg16-397923af.pth   from download.pytorch.org/models (torchvision VGG16;
                       the URL basename embeds the checksum prefix 397923af)
  lpips vgg.pth lins   from github.com/richzhang/PerceptualSimilarity
                       (lpips/weights/v0.1/vgg.pth)

Usage:
    python tools/make_lpips_golden.py vgg16-397923af.pth vgg.pth \
        weights/fixtures/lpips_golden.npz
"""

import hashlib
import sys

import numpy as np


def main(backbone_path, lin_path, out_path):
    import torch
    import torch.nn.functional as F

    state = torch.load(backbone_path, map_location="cpu")
    lin_state = torch.load(lin_path, map_location="cpu")

    w0 = state["features.0.weight"].float()          # [64, 3, 3, 3]
    b0 = state["features.0.bias"].float()             # [64]

    rng = np.random.default_rng(1234)
    x = rng.uniform(-1.0, 1.0, (1, 3, 16, 16)).astype(np.float32)
    act = F.relu(F.conv2d(torch.from_numpy(x), w0, b0, padding=1)).numpy()

    # full-distance golden: run the actual lpips package if available
    extras = {}
    try:
        import lpips as lpips_pkg

        net = lpips_pkg.LPIPS(net="vgg")
        a = rng.uniform(0.0, 1.0, (1, 3, 64, 64)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
        with torch.no_grad():
            d = net(torch.from_numpy(a) * 2 - 1, torch.from_numpy(b) * 2 - 1)
        extras = {"pair_a": a, "pair_b": b,
                  "lpips_vgg_distance": np.float32(d.item())}
    except ImportError:
        print("lpips package unavailable — writing conv-layer golden only")

    sha = {p: hashlib.sha256(open(p, "rb").read()).hexdigest()
           for p in (backbone_path, lin_path)}
    np.savez(out_path,
             conv0_w=w0.numpy(), conv0_b=b0.numpy(),
             conv0_in=x, conv0_out=act,
             lin0=lin_state["lin0.model.1.weight"].numpy().reshape(-1),
             **extras)
    print(f"wrote {out_path}")
    for p, h in sha.items():
        print(f"  sha256({p}) = {h}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
