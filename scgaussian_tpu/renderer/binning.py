"""Tile binning: Gaussian -> (tile, depth)-ordered per-tile index lists.

TPU-native replacement for the CUDA duplicate-key radix sort
(diff_gaussian_rasterization's duplicateWithKeys + cub radix sort + tile
ranges). Instead of atomics and dynamic lists, everything is a fixed-shape
XLA program:

  1. depth-sort the primitive axis (ascending view z, stable);
  2. expand each Gaussian into one entry per covered tile using an
     exclusive-prefix-sum + searchsorted "ragged expand" over a static entry
     budget L;
  3. lexicographic sort entries by (tile_id, depth_rank);
  4. scatter entry -> (tile, position) into a padded [num_tiles, K] gather
     table of original Gaussian indices.

All outputs are index tensors (stop-gradient); the differentiable gather of
Gaussian attributes happens in tile_raster.py so autodiff turns it into a
scatter-add in the backward pass.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from scgaussian_tpu.renderer.oracle import depth_order
from scgaussian_tpu.renderer.project import ProjectedGaussians, tile_rect


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileBins:
    """gather_idx[t, k] = original Gaussian index of the k-th (front-to-back)
    splat of tile t, or the sentinel N for empty slots."""

    gather_idx: jnp.ndarray  # [T, K] int32, sentinel = N
    counts: jnp.ndarray  # [T] int32, clamped to K
    total_entries: jnp.ndarray  # [] int32 — true duplicated entry count
    overflow: jnp.ndarray  # [] int32 — entries dropped by the L budget or K cap


def bin_gaussians(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    tile: int,
    max_per_tile: int,
    entry_budget: int,
) -> TileBins:
    nx = (width + tile - 1) // tile
    ny = (height + tile - 1) // tile
    num_tiles = nx * ny
    n = proj.depth.shape[0]
    K = max_per_tile
    L = entry_budget

    mean2d = jax.lax.stop_gradient(proj.mean2d)
    depth = jax.lax.stop_gradient(proj.depth)

    order = depth_order(depth, proj.valid)  # [N]
    mean2d_s = mean2d[order]
    radius_s = proj.radius[order]

    rect_min, rect_max = tile_rect(mean2d_s, radius_s, width, height, tile)
    cov_w = rect_max[:, 0] - rect_min[:, 0]
    cov_h = rect_max[:, 1] - rect_min[:, 1]
    cov = cov_w * cov_h  # [N] tiles covered, 0 for culled

    offs = jnp.cumsum(cov) - cov  # exclusive prefix sum
    total = jnp.sum(cov)

    # Ragged expand: entry e belongs to sorted-Gaussian gi with slot j.
    e = jnp.arange(L, dtype=jnp.int32)
    gi = jnp.searchsorted(offs, e, side="right").astype(jnp.int32) - 1
    gi = jnp.clip(gi, 0, n - 1)
    j = e - offs[gi]
    valid_e = e < total

    tx = rect_min[gi, 0] + j % jnp.maximum(cov_w[gi], 1)
    ty = rect_min[gi, 1] + j // jnp.maximum(cov_w[gi], 1)
    tile_e = jnp.where(valid_e, ty * nx + tx, num_tiles)
    rank_e = jnp.where(valid_e, gi, n)

    # Per-tile front-to-back order == (tile, depth rank) lexicographic sort.
    tile_sorted, rank_sorted = jax.lax.sort((tile_e, rank_e), num_keys=2)

    starts = jnp.searchsorted(tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32))
    counts_full = (starts[1:] - starts[:-1]).astype(jnp.int32)
    pos = jnp.arange(L, dtype=jnp.int32) - starts[tile_sorted]

    in_table = (tile_sorted < num_tiles) & (pos < K)
    dest = jnp.where(in_table, tile_sorted * K + pos, num_tiles * K)

    orig_idx = jnp.where(rank_sorted < n, order[jnp.clip(rank_sorted, 0, n - 1)], n)
    gather_flat = jnp.full((num_tiles * K,), n, dtype=jnp.int32)
    gather_flat = gather_flat.at[dest].set(
        orig_idx.astype(jnp.int32), mode="drop"
    )

    counts = jnp.minimum(counts_full, K)
    overflow = jnp.maximum(total - jnp.int32(L), 0) + jnp.sum(
        jnp.maximum(counts_full - K, 0)
    )
    return TileBins(
        gather_idx=gather_flat.reshape(num_tiles, K),
        counts=counts,
        total_entries=total,
        overflow=overflow,
    )
