"""LaRa-TPU: a TPU-native feed-forward large-baseline radiance-field framework.

Re-implements the complete capability surface of autonomousvision/LaRa
(ECCV 2024, arXiv 2407.04699) as an idiomatic JAX/XLA/Pallas stack:

- ``lara_tpu.ops.rasterizer``: differentiable tile-based 2D Gaussian surfel
  rasterizer (replaces the CUDA ``diff-surfel-rasterization`` extension).
- ``lara_tpu.models``: ViT image encoder, volume transformer with group
  attention, coarse/fine Gaussian decoders (replaces lightning/network.py).
- ``lara_tpu.train``: jit-compiled training system with mesh data
  parallelism, AdamW + cosine warmup, bf16 mixed precision, orbax
  checkpointing (replaces lightning/system.py + pytorch-lightning Trainer).
- ``lara_tpu.data``: HDF5 scene datasets (gobjaverse / GSO / Co3D / ...)
  with host-side prefetch (replaces dataLoader/).
- ``lara_tpu.eval``: PSNR/SSIM/LPIPS/depth metrics, orbit video rendering,
  TSDF mesh extraction (replaces evaluation.py + tools/).
"""

__version__ = "0.1.0"
