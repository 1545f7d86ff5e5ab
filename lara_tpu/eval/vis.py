"""Visualization panels for training/eval logging.

Counterpart of lightning/vis.py + tools/img_utils.py:159-176: per-batch
panels of gt/pred RGB, colorized depth, rendered and depth-derived normals
(+ fine variants), as HWC uint8-ready float arrays keyed like the
reference's `vis_images`."""

from __future__ import annotations

from typing import Dict

import numpy as np


def visualize_depth(depth: np.ndarray, minmax=None) -> np.ndarray:
    """Colorize a depth map with the jet colormap on valid (>0) pixels
    (tools/img_utils.py:159-176 equivalent, cv2-based)."""
    import cv2

    x = np.nan_to_num(np.asarray(depth, np.float32))
    valid = x > 0
    if minmax is None:
        mi = float(x[valid].min()) if valid.any() else 0.0
        ma = float(x.max()) if x.size else 1.0
    else:
        mi, ma = minmax
    x = np.where(valid, (x - mi) / max(ma - mi, 1e-8), 0.0)
    x8 = (255 * np.clip(x, 0, 1)).astype(np.uint8)
    color = cv2.applyColorMap(x8, cv2.COLORMAP_JET)[..., ::-1]
    return color.astype(np.float32) / 255.0


def _cat_views(a: np.ndarray) -> np.ndarray:
    """[N, H, W, C] → [H, N·W, C] (the reference concatenates views along
    width, lightning/network.py:527)."""
    return np.concatenate(list(a), axis=1)


def vis_images(output: Dict, batch: Dict) -> Dict[str, np.ndarray]:
    """Build the standard panels for every scene in the batch; returns
    name → [B, H, W', 3] float arrays (lightning/vis.py:7-57)."""
    out = {}
    gt = np.asarray(batch["tar_rgb"], np.float32)
    b = gt.shape[0]

    def grab(key):
        return np.asarray(output[key], np.float32) if key in output else None

    panels: Dict[str, list] = {}
    for i in range(b):
        rows = {"gt_rgb": _cat_views(gt[i])}
        for prex in ("", "_fine"):
            img = grab(f"image{prex}")
            if img is None:
                continue
            rows[f"pred_rgb{prex}"] = _cat_views(img[i])
            dep = grab(f"depth{prex}")
            if dep is not None:
                rows[f"depth{prex}"] = visualize_depth(_cat_views(dep[i])[..., 0])
            for nk in (f"rend_normal{prex}", f"depth_normal{prex}"):
                nrm = grab(nk)
                if nrm is not None:
                    rows[nk] = (_cat_views(nrm[i]) + 1.0) / 2.0
        for k, v in rows.items():
            panels.setdefault(k, []).append(v)

    for k, v in panels.items():
        out[k] = np.stack(v)
    return out
