"""K-nearest-neighbor mean distances (replaces `simple_knn._C.distCUDA2`).

The reference's legacy 3DGS renderer initializes per-point scales from the
mean distance to the 3 nearest neighbors (lightning/renderer.py:141). At
LaRa's point counts a chunked brute-force on TPU is plenty fast
(SURVEY.md §2.2 item 3)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_mean_dist(points: jnp.ndarray, k: int = 3, chunk: int = 1024) -> jnp.ndarray:
    """points [N, 3] → mean squared distance to each point's k nearest
    neighbors (excluding itself), matching distCUDA2 semantics."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e9)

    def per_chunk(q):  # [chunk, 3]
        d2 = jnp.sum((q[:, None, :] - points[None, :, :]) ** 2, axis=-1)  # [chunk, N]
        # k+1 smallest includes the point itself (distance 0)
        neg_top, _ = jax.lax.top_k(-d2, k + 1)
        return jnp.mean(-neg_top[:, 1:], axis=-1)

    out = jax.lax.map(per_chunk, pts_pad.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]
