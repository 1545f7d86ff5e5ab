#!/usr/bin/env python
"""Evaluation / inference entry point (counterpart of evaluation.py).

Usage:
    python evaluate.py configs/infer.yaml [more.yaml ...] [key=value ...]

Per scene: forward pass (fine stage on), PSNR/SSIM(/LPIPS if weights are
available) on the novel-view crop, optional depth metrics, optional orbit
video, optional TSDF mesh; metrics JSON-dumped per scene + means
(evaluation.py:30-176)."""

import json
import os
import sys

for var in ("MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS", "OMP_NUM_THREADS",
            "VECLIB_MAXIMUM_THREADS", "OPENBLAS_NUM_THREADS"):
    os.environ.setdefault(var, "4")

import numpy as np


def main(argv=None):
    from lara_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from lara_tpu.config import load_config
    from lara_tpu.data import DataLoader, dataset_dict
    from lara_tpu.eval.metrics import abs_error, acc_threshold, psnr, ssim
    from lara_tpu.models import LaRaNet
    from lara_tpu.train import checkpoint as ckpt
    from lara_tpu.config import parse_cli

    paths, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    here = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(here, "configs", "base.yaml")
    infer_base = os.path.join(here, "configs", "infer.yaml")
    cfg = load_config(base, infer_base, *paths, overrides=overrides)

    ds = dataset_dict[cfg.infer_dataset.dataset_name](cfg.infer_dataset)
    loader = DataLoader(ds, cfg.infer_dataset.batch_size, shuffle=False,
                        num_workers=cfg.infer_dataset.num_workers, drop_last=False)

    net = LaRaNet(cfg)
    sample = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in sample.items() if k != "meta"}
    params = jax.jit(lambda r: net.init(r, arrays, with_fine=True, train=False))(
        jax.random.PRNGKey(0))
    if cfg.infer.ckpt_path:
        params = ckpt.restore_params(cfg.infer.ckpt_path)
        print(f"restored params from {cfg.infer.ckpt_path}")

    lpips_vgg_fn = _try_load_lpips("vgg", required=cfg.infer.require_lpips)
    lpips_alex_fn = _try_load_lpips("alex", required=cfg.infer.require_lpips)
    fwd = jax.jit(lambda p, b: net.apply(
        p, b, with_fine=True, train=False,
        return_buffer=cfg.infer.video_frames > 0 or cfg.infer.save_mesh,
        render_scale=cfg.infer.render_img_scale))

    # Distributed evaluation (beyond the single-GPU reference): scenes are
    # independent, so a batch of B scenes shards over min(B, device_count)
    # dp ranks — evaluate.py throughput scales with chips. Single-device
    # stays committed-input-free (the axon trap, parallel/mesh.py).
    from lara_tpu.parallel.mesh import make_mesh, shard_batch
    n_dp = 1
    if jax.device_count() > 1 and cfg.infer_dataset.batch_size > 1:
        n_dp = max(d for d in range(1, jax.device_count() + 1)
                   if cfg.infer_dataset.batch_size % d == 0)
    mesh = make_mesh(n_dp=n_dp, devices=jax.devices()[:n_dp])
    if n_dp > 1:
        print(f"evaluating with dp={n_dp} over {n_dp} devices")

    os.makedirs(cfg.infer.save_folder, exist_ok=True)
    os.makedirs(cfg.infer.metric_path, exist_ok=True)
    n_view = cfg.n_views
    names, psnrs, ssims, depth_accs = [], [], [], []
    lpips_vggs, lpips_alexs = [], []

    for i, batch in enumerate(loader):
        arrays = {k: jnp.asarray(v) for k, v in batch.items() if k != "meta"}
        n_scenes = int(arrays["tar_rgb"].shape[0])
        if n_dp > 1 and n_scenes % n_dp == 0:
            arrays = shard_batch(arrays, mesh)
        out = fwd(params, arrays)
        img_key = "image_fine" if "image_fine" in out else "image"
        dep_key = "depth_fine" if "depth_fine" in out else "depth"

        for j in range(n_scenes):
            name = str(batch["meta"][j]["scene"]).split(".")[0]
            pred = np.asarray(out[img_key][j])          # [N,H,W,3]
            gt = np.asarray(batch["tar_rgb"][j])

            if cfg.infer.eval_novel_view_only:
                pred_m, gt_m = pred[n_view:], gt[n_view:]
            else:
                pred_m, gt_m = pred, gt
            if pred_m.size:
                # the reference scores ONE horizontal mosaic of the selected
                # views — pooled PSNR, a single SSIM (Gaussian windows cross
                # view seams) and a single LPIPS call (evaluation.py:75-95)
                mosaic_p = np.concatenate(list(pred_m), axis=1)
                mosaic_g = np.concatenate(list(gt_m), axis=1)
                psnrs.append(psnr(mosaic_p, mosaic_g))
                ssims.append(ssim(mosaic_p, mosaic_g))
                if lpips_vgg_fn is not None:
                    lpips_vggs.append(lpips_vgg_fn(mosaic_g, mosaic_p))
                if lpips_alex_fn is not None:
                    lpips_alexs.append(lpips_alex_fn(mosaic_g, mosaic_p))

            if len(cfg.infer.eval_depth) and "tar_dep" in batch:
                dp = np.asarray(out[dep_key][j, ..., 0])
                dg = np.asarray(batch["tar_dep"][j])
                mask = np.asarray(batch["tar_msk"][j]).astype(bool)
                accs = [float(abs_error(dp, dg, mask).mean())]
                accs += [float(acc_threshold(dp, dg, mask, t).mean())
                         for t in cfg.infer.eval_depth]
                depth_accs.append(accs)

            if len(names) < 100:
                _save_panel(os.path.join(cfg.infer.save_folder, f"{name}.jpg"),
                            gt, pred)

            if cfg.infer.video_frames > 0 or cfg.infer.save_mesh:
                from lara_tpu.eval.render_artifacts import (render_video,
                                                            extract_mesh)
                gauss = jax.tree.map(lambda a: np.asarray(a[j]),
                                     out["render_pkg"]["fine"])
                tm = np.asarray(batch["transform_mats"][j]).reshape(4, 4)
                sample_j = {k: (v if k == "meta" else
                                jax.tree.map(lambda a: a[j:j + 1], v))
                            for k, v in batch.items()}
                if cfg.infer.video_frames > 0:
                    render_video(
                        os.path.join(cfg.infer.save_folder,
                                     f"{name}_video.mp4"),
                        gauss, cfg, tm, n_frames=cfg.infer.video_frames,
                        sample=sample_j)
                if cfg.infer.save_mesh:
                    extract_mesh(
                        os.path.join(cfg.infer.save_folder, f"{name}.obj"),
                        gauss, cfg, tm)

            names.append(name)
            print(f"[{len(names)}/{len(loader) * n_scenes}] {name} "
                  f"psnr={psnrs[-1] if psnrs else float('nan'):.2f}")

    metrics = {
        "scenes": names,
        "psnr": psnrs, "ssim": ssims,
        "lpips_vgg": lpips_vggs, "lpips_alex": lpips_alexs,
        "depth": depth_accs,
        "mean_psnr": float(np.mean(psnrs)) if psnrs else None,
        "mean_ssim": float(np.mean(ssims)) if ssims else None,
        "mean_lpips_vgg": float(np.mean(lpips_vggs)) if lpips_vggs else None,
        "mean_lpips_alex": float(np.mean(lpips_alexs)) if lpips_alexs else None,
        "mean_depth": np.mean(depth_accs, axis=0).tolist() if depth_accs else None,
    }
    out_path = os.path.join(cfg.infer.metric_path,
                            f"{cfg.infer_dataset.dataset_name}.json")
    with open(out_path, "w") as f:
        json.dump(metrics, f, indent=2)
    print(f"metrics -> {out_path}")
    if metrics["mean_psnr"] is not None:
        print(f"mean PSNR {metrics['mean_psnr']:.3f}  mean SSIM {metrics['mean_ssim']:.4f}")
    return metrics


def _try_load_lpips(net: str = "vgg", required: bool = False):
    """LPIPS needs pretrained VGG/Alex weights. When they're missing or
    corrupt, warn LOUDLY and skip the metric — or hard-fail with
    infer.require_lpips=True (the reference always hard-fails,
    evaluation.py:48-49)."""
    from lara_tpu.eval.lpips import load_lpips
    try:
        return load_lpips(net=net)
    except Exception as e:
        if required:
            raise RuntimeError(
                f"LPIPS-{net} weights unavailable and infer.require_lpips=True: "
                f"{e!r}. Convert them with tools/convert_lpips.py.") from e
        import warnings
        warnings.warn(
            f"LPIPS-{net} weights unavailable ({e!r}) — the lpips_{net} "
            "metric will be MISSING from the report. Convert weights with "
            "tools/convert_lpips.py or set infer.require_lpips=True to fail "
            "instead.", RuntimeWarning, stacklevel=2)
        return None


def _save_panel(path, gt, pred):
    import cv2

    row_gt = np.concatenate(list(gt), axis=1)
    row_pr = np.concatenate(list(pred), axis=1)
    panel = np.concatenate([row_gt, row_pr], axis=0)
    cv2.imwrite(path, (panel[..., ::-1] * 255).clip(0, 255).astype(np.uint8))


if __name__ == "__main__":
    main()
