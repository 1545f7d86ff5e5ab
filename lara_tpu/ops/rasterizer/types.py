"""Static configuration and output types for the 2DGS rasterizer."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static (hashable) rasterizer configuration.

    height/width: output image extent in pixels (must be multiples of `tile`).
    tile:        square tile edge in pixels (16 → 256 px per tile).
    dup:         duplication grid edge — each surfel may claim up to dup×dup
                 tiles; its screen radius is clamped to (dup-1)*tile/2 px so
                 the claim always covers the true footprint.
    tile_budget: max depth-sorted entries composited per tile (closest kept).
    tile_chunk:  tiles processed per scan step (memory/throughput knob).
    sh_degree:   active SH degree for view-dependent color.
    alpha_min / transmittance_min / near_cull: culling thresholds matching the
                 upstream 2DGS CUDA kernels (1/255, 1e-4, 0.2).
    dist_near / dist_far: fixed depth-normalization range of the distortion
                 accumulator (upstream uses constants, not camera near/far, so
                 LaRa's 1000× distortion weight transfers unchanged;
                 consumed at lightning/loss.py:49-52).
    filter2d_invsq: inverse variance of the object-space low-pass filter
                 (upstream FilterInvSquare = 2 ⇒ σ² = 0.5 px²).
    """

    height: int = 512
    width: int = 512
    tile: int = 16
    dup: int = 3
    tile_budget: int = 256
    tile_chunk: int = 64
    sh_degree: int = 1
    # Visible-surfel budget: after the depth sort, only the nearest
    # `visible_budget` frustum-surviving surfels enter dup-expansion +
    # key sort (the farthest overflow is dropped — early termination would
    # almost always have skipped it). Cuts the dominant key-sort size by
    # ~N/V. 0 disables (keep all N). In trained LaRa scenes ~15-25% of the
    # 524k candidates survive the opacity/frustum cull at 512².
    visible_budget: int = 0
    # Pallas kernel knobs: entries composited per inner step, and 16×16
    # tiles handled per sequential grid step (amortizes per-step DMA/loop
    # overhead; must divide the tile count).
    pallas_chunk: int = 32
    pallas_tiles_per_step: int = 4
    # (A tiles-per-step-batched kernel mode — one shared chunk while_loop
    # over [tpg, C, P] — existed through round 4 but could never compile
    # on real TPU: two independent Mosaic lowering bugs on the [tpg,1,1]
    # per-tile count vector; see _tile_consts in pallas_blend.py. Removed.)
    # Stash each chunk's carry-in (plus the processed-chunk count) as an
    # extra forward-kernel output (~8.4 MB at the production config) so
    # the backward kernel skips its in-kernel forward replay — trades one
    # full forward walk per tile for a small HBM round-trip. Under the
    # train step's per-view rematerialization the stash is a transient of
    # the recompute+backward pair, so it never accumulates across views.
    pallas_stash_carries: bool = True
    alpha_min: float = 1.0 / 255.0
    transmittance_min: float = 1e-4
    near_cull: float = 0.2
    dist_near: float = 0.2
    dist_far: float = 100.0
    filter2d_invsq: float = 2.0
    backend: str = "tiled"  # "tiled" | "reference" | "pallas"
    # Tile-window construction algorithm ("sort" | "count"):
    #   sort:  one stable 9V-key lax.sort + searchsorted + window slicing
    #          (round-1/2 production path);
    #   count: counting sort — per-(surfel, tile) depth ranks via blocked
    #          strictly-lower-triangular matmul cumsum over the tile
    #          membership matrix (MXU, exact f32 accumulation) and ONE
    #          unique-index scatter straight into the [T, K] windows.
    #          Identical output (both orders are depth-stable); the CUDA
    #          reference's radix sort (SURVEY §2.3 step 3) has no MXU to
    #          lean on — this is the TPU-shaped replacement.
    bin_mode: str = "sort"
    # Depth-compaction data movement ("gather" | "fused"):
    #   gather: one wide [V, 14] row gather into depth order (default; also
    #           always used by bin_mode="count", whose slot_pos inverse is
    #           defined over compacted rows).
    #   fused:  no packed-row gather — tile bounds ride the depth sort and
    #           the window key sort carries original surfel row ids, so the
    #           one window gather reads the un-permuted [N, 13] pack.
    #           MEASURED SLOWER on TPU v5e at the production config
    #           (fwd 125.7 vs 127.8 fps, fwd+bwd 42.0 vs 47.4): the saved
    #           pack gather is repaid to the KV window sort, and the
    #           backward's scatter-add lands in [N, 13] (524k rows) instead
    #           of [V, 13] + a masked gather. Kept for A/B regression.
    pack_mode: str = "gather"
    # Per-chunk prefix-scan algorithm inside the Pallas blend kernels
    # ("dot" | "shift" | "prod"):
    #   dot:   [C,C]@[C,P] lower-triangular matmuls (fp32 HIGHEST runs the
    #          MXU multi-pass — 4 dots ≈ 8.4 MFLOP/chunk);
    #   shift: log2(C) shifted adds (Hillis–Steele) on the VPU — exact f32,
    #          ~20× fewer ops; same values up to addition order;
    #   prod:  shift, plus transmittance tracked MULTIPLICATIVELY
    #          (T ← T·(1−α), the CUDA recurrence) instead of in log domain —
    #          drops log1p + exp(cumsum), 2 of the 3 transcendentals per
    #          entry-pixel, in the forward and its VJP.
    pallas_cumsum: str = "shift"

    def __post_init__(self):
        assert self.height % self.tile == 0 and self.width % self.tile == 0, (
            "image extent must be a multiple of the tile size"
        )

    @property
    def tiles_x(self) -> int:
        return self.width // self.tile

    @property
    def tiles_y(self) -> int:
        return self.height // self.tile

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def max_radius(self) -> float:
        return (self.dup - 1) * self.tile / 2.0


class RenderOutput(NamedTuple):
    """Per-camera rasterizer outputs. Mirrors (rendered_image, allmap) of the
    CUDA extension, unpacked the way lightning/renderer_2dgs.py:226-246 does.

    All maps are [H, W, ...]; `normal` is in *camera* space (the renderer
    wrapper rotates it to world space), `depth_expected` is already
    alpha-normalized, `depth_median` is nan-free (0 where alpha never crosses
    0.5).
    """

    image: jnp.ndarray          # [H, W, 3]
    alpha: jnp.ndarray          # [H, W]
    depth_expected: jnp.ndarray  # [H, W]
    depth_median: jnp.ndarray   # [H, W]
    normal: jnp.ndarray         # [H, W, 3] camera space
    distortion: jnp.ndarray     # [H, W]


class ProjectedSurfels(NamedTuple):
    """Per-surfel camera-space quantities produced by preprocess (SoA)."""

    center_cam: jnp.ndarray  # [N, 3]
    au: jnp.ndarray          # [N, 3] tangent axis u / s_u (maps offsets → σ units)
    bv: jnp.ndarray          # [N, 3] tangent axis v / s_v
    normal: jnp.ndarray      # [N, 3] unit plane normal, flipped toward camera
    rgb: jnp.ndarray         # [N, 3] SH-evaluated color
    opacity: jnp.ndarray     # [N]
    depth: jnp.ndarray       # [N] camera-space z of the center
    center2d: jnp.ndarray    # [N, 2] pixel coords (pixel centers at +0.5)
    radius: jnp.ndarray      # [N] clamped screen radius in pixels
    valid: jnp.ndarray       # [N] bool
