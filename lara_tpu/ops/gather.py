"""Gather transposes: plain XLA vs hand-built scatter-free custom VJPs.

XLA transposes a gather into a scatter-add. On the current TPU toolchain
the measured verdict is mode-dependent (see tools/profile_rasterizer.py):

  - the tile-window gather transpose (131k cotangent rows scatter-added
    into 163k rows) lowers WELL — plain XLA beats every hand-built
    alternative measured (sort + fan-in gathers: 24 ms; sort + shifted
    segment adds: ~90 ms; XLA scatter: <3 ms inside the full backward);
  - round-1 measurements of a full-permutation row scatter (524k rows)
    showed 56 ms, which motivated these custom paths in the first place.

Two module switches select the implementation (flip before tracing — jit
caches per traced graph):

  - `WINDOW_MODE` (default "xla"): the tile-window gather keeps the stock
    XLA gather/scatter pair;
  - `TAKE_ROWS_MODE` (default "inv"): `take_rows` uses the forward-carried
    inverse-permutation VJP *when the caller supplies `inv_pos`* (the
    rasterizer's depth-compaction does), and otherwise deliberately falls
    back to the plain XLA gather — for selection-style index sets (e.g.
    the fine stage's `top_k`) the inverse is not free to build, and XLA's
    scatter-add transpose measured faster than the sort-based "lazy"
    reconstruction (29.4 ms vs 112 ms full render fwd+bwd,
    docs/rasterizer.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# "xla": plain gather, XLA derives the transpose (scatter-add).
# "lazy": custom VJPs that transpose via sort + gathers, no scatter.
# Measured on TPU v5e at the LaRa production workload (512², dup=3,
# visible_budget=163840, tile_budget=128):
#   window gather transpose: xla 2.2 ms / lazy 24-47 ms  → default xla
#   take_rows transpose: see tools/profile_rasterizer.py --take-mode A/B
TAKE_ROWS_MODE = "inv"
WINDOW_MODE = "xla"


def take_rows(x: jnp.ndarray, idx: jnp.ndarray, inv_pos=None):
    """x[idx] for V *distinct* row indices; see TAKE_ROWS_MODE.

    `inv_pos` [N] (optional): position of row i in `idx` (≥ V when absent) —
    lets "inv" mode express the transpose as one masked row gather in the
    backward. Only consulted in "inv" mode; when omitted, "inv" uses the
    plain XLA gather (scatter-add transpose), which measured faster than
    reconstructing the inverse in the backward ("lazy") for selection-style
    indices — see the module docstring."""
    if TAKE_ROWS_MODE == "lazy":
        return _take_rows_lazy(x, idx)
    if TAKE_ROWS_MODE == "inv" and inv_pos is not None:
        return _take_rows_inv(x, idx, inv_pos)
    return x[idx]  # "xla": let XLA derive the scatter-add transpose


@jax.custom_vjp
def _take_rows_inv(x: jnp.ndarray, idx: jnp.ndarray, inv_pos: jnp.ndarray):
    """x[idx] with the transpose as a single masked gather by the
    forward-computed inverse position: d_x[i] = g[inv_pos[i]] if
    inv_pos[i] < V else 0 (round-1 production formulation)."""
    return x[idx]


def _take_inv_fwd(x, idx, inv_pos):
    return x[idx], (idx.shape[0], inv_pos)


def _take_inv_bwd(res, g):
    v, inv_pos = res
    safe = jnp.minimum(inv_pos, v - 1)
    hit = (inv_pos < v).reshape(inv_pos.shape + (1,) * (g.ndim - 1))
    return jnp.where(hit, g[safe], 0.0), None, None


_take_rows_inv.defvjp(_take_inv_fwd, _take_inv_bwd)


def window_gather(packed: jnp.ndarray, win_gidx: jnp.ndarray,
                  entry_valid: jnp.ndarray, max_dup: int, slot_pos=None):
    """packed[win_gidx] ([V,F] × [T,K] → [T,K,F]) where every row of
    `packed` appears at most `max_dup` times among *valid* window entries
    (invalid entries must receive exactly-zero cotangents); see
    WINDOW_MODE.

    `slot_pos` [V, max_dup] (optional, counting-sort binning): row i's
    flat positions i·K+rank in the window array, ≥ T·K where absent — the
    exact inverse of the gather, known from the forward, so the transpose
    becomes max_dup masked row gathers instead of XLA's scatter-add."""
    if slot_pos is not None:
        return _window_gather_slots(packed, win_gidx, slot_pos)
    if WINDOW_MODE == "xla":
        return packed[win_gidx]
    return _window_gather_lazy(packed, win_gidx, entry_valid, max_dup)


@jax.custom_vjp
def _window_gather_slots(packed: jnp.ndarray, win_gidx: jnp.ndarray,
                         slot_pos: jnp.ndarray):
    return packed[win_gidx]


def _wgs_fwd(packed, win_gidx, slot_pos):
    return packed[win_gidx], slot_pos


def _wgs_bwd(slot_pos, g):
    t, k, f = g.shape
    g2 = g.reshape(t * k, f)
    m = t * k
    d = None
    for s in range(slot_pos.shape[1]):
        pos = slot_pos[:, s]
        hit = (pos < m)[:, None]
        term = jnp.where(hit, g2[jnp.minimum(pos, m - 1)], 0.0)
        d = term if d is None else d + term
    return d, None, None


_window_gather_slots.defvjp(_wgs_fwd, _wgs_bwd)


@jax.custom_vjp
def _take_rows_lazy(x: jnp.ndarray, idx: jnp.ndarray):
    """Transpose as a gather by the lazily-built inverse position:
    d_x[i] = d_out[pos of i in idx] if present else 0 (idx is
    duplicate-free). The inverse comes from a V-row key sort +
    searchsorted in the backward — nothing carried from the forward."""
    return x[idx]


def _take_fwd(x, idx):
    return x[idx], (idx, x.shape[0])


def _take_bwd(res, g):
    idx, n = res
    v = idx.shape[0]
    sidx, pos = jax.lax.sort_key_val(idx.astype(jnp.int32),
                                     jnp.arange(v, dtype=jnp.int32))
    sidx = jax.lax.optimization_barrier(sidx)
    rows = jnp.arange(n, dtype=jnp.int32)
    cand = jnp.minimum(jnp.searchsorted(sidx, rows).astype(jnp.int32), v - 1)
    hit = (sidx[cand] == rows).reshape((n,) + (1,) * (g.ndim - 1))
    d_x = jnp.where(hit, g[pos[cand]], 0.0)
    return d_x, None


_take_rows_lazy.defvjp(_take_fwd, _take_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _window_gather_lazy(packed: jnp.ndarray, win_gidx: jnp.ndarray,
                        entry_valid: jnp.ndarray, max_dup: int):
    """Scatter-free window-gather transpose: sort the flattened indices
    with a valid-first composite key, gather cotangent rows into segment
    order, and take each segment's ≤ max_dup-entry sum with a fixed fan-in
    of masked row gathers. Exact summation (no cumsum cancellation).
    Measured SLOWER than XLA's scatter at LaRa scale — kept for A/B."""
    return packed[win_gidx]


def _wg_fwd(packed, win_gidx, entry_valid, max_dup):
    return packed[win_gidx], (win_gidx, entry_valid, packed.shape[0])


def _wg_bwd(max_dup, res, g):
    win_gidx, entry_valid, v = res
    f = g.shape[-1]
    m2 = win_gidx.size
    # valid-first within each surfel's segment: key = gidx·2 + (1 - valid);
    # all valid appearances of surfel i share key i·2 and lead its segment.
    keys = (win_gidx.reshape(m2) << 1) | (1 - entry_valid.reshape(m2).astype(jnp.int32))
    g2 = g.reshape(m2, f)
    skeys, perm = jax.lax.sort_key_val(keys, jnp.arange(m2, dtype=jnp.int32))
    skeys = jax.lax.optimization_barrier(skeys)
    gs = g2[perm]                                    # [M2, F] segment order
    vids = jnp.arange(v, dtype=jnp.int32) << 1
    lo = jnp.searchsorted(skeys, vids).astype(jnp.int32)
    hi = jnp.searchsorted(skeys, vids + 1).astype(jnp.int32)
    n_valid = hi - lo                                # ≤ max_dup by contract
    gs = jax.lax.optimization_barrier(gs)
    d = jnp.zeros((v, f), g.dtype)
    for j in range(max_dup):
        take = jnp.minimum(lo + j, m2 - 1)
        d = d + jnp.where((j < n_valid)[:, None], gs[take], 0.0)
    return d, None, None


_window_gather_lazy.defvjp(_wg_fwd, _wg_bwd)
