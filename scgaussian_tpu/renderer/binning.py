"""Tile binning: Gaussian -> (tile, depth)-ordered entry ranges.

TPU-native replacement for the CUDA duplicate-key radix sort
(diff_gaussian_rasterization's duplicateWithKeys + cub radix sort + tile
ranges). Designed around what XLA:TPU executes well — sorts and gathers —
and deliberately avoids scatters (slow on TPU) everywhere:

  1. depth-sort the primitive axis (ascending view z, stable);
  2. expand each Gaussian into one entry per covered tile with a
     prefix-sum + searchsorted "ragged expand" over a static budget L
     (entries come out gaussian-major = depth-major);
  3. ONE stable single-key sort by tile id — stability preserves the
     depth order within each tile, so no composite (tile|depth) key is
     needed; payloads carry the original Gaussian index and the pre-sort
     entry position (used by the rasterizer's scatter-free backward);
  4. per-tile ranges via searchsorted — per-tile lists are [start, start+k)
     slices of the sorted entry array, no padded gather table.

All outputs are index tensors (stop-gradient); the differentiable use
happens in tile_raster.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from scgaussian_tpu.renderer.oracle import depth_order
from scgaussian_tpu.renderer.project import ProjectedGaussians, tile_rect


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileBins:
    """Entry e of the tile-sorted order refers to Gaussian
    `orig_idx_sorted[e]` (sentinel N for empty/over-budget slots); tile t
    owns entries [starts[t], starts[t] + counts[t])."""

    orig_idx_sorted: jnp.ndarray  # [L] int32, sentinel = N
    presort_pos_sorted: jnp.ndarray  # [L] int32: pre-sort (gaussian-major) slot
    sorted_pos_of_presort: jnp.ndarray  # [L] int32: inverse of the above
    starts: jnp.ndarray  # [T + 1] int32
    counts: jnp.ndarray  # [T] int32 (uncapped; rasterizer caps at K)
    seg_offsets: jnp.ndarray  # [N] int32: gaussian-major segment start (depth order)
    seg_counts: jnp.ndarray  # [N] int32: tiles covered per depth-sorted Gaussian
    order: jnp.ndarray  # [N] int32: depth-sort permutation (rank -> orig idx)
    inv_order: jnp.ndarray  # [N] int32: orig idx -> rank
    total_entries: jnp.ndarray  # [] int32
    overflow: jnp.ndarray  # [] int32 — entries beyond the L budget


def default_entry_budget(n: int) -> int:
    """Default tile-entry budget for N primitives: next power of two >= 4N
    (>= 16k). Power-of-two sizes keep the [L] sorts and cumsums on their
    fastest path, and 4N covers typical 3DGS tile coverage (~3-5 tiles per
    visible Gaussian). Training auto-regrows on overflow (the guard in
    train/pipeline.py), so a tight default costs at most one recompile
    instead of silently truncating — the reference CUDA pipeline sizes this
    buffer exactly per frame and never truncates."""
    want = max(4 * n, 1 << 14)
    return 1 << (want - 1).bit_length()


def bin_gaussians(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    tile: int,
    entry_budget: int,
) -> TileBins:
    nx = (width + tile - 1) // tile
    ny = (height + tile - 1) // tile
    num_tiles = nx * ny
    n = proj.depth.shape[0]
    L = entry_budget

    mean2d = jax.lax.stop_gradient(proj.mean2d)
    depth = jax.lax.stop_gradient(proj.depth)

    order = depth_order(depth, proj.valid).astype(jnp.int32)  # [N] rank -> orig
    inv_order = jnp.argsort(order).astype(jnp.int32)
    mean2d_s = mean2d[order]
    radius_s = proj.radius[order]

    rect_min, rect_max = tile_rect(mean2d_s, radius_s, width, height, tile)
    cov_w = rect_max[:, 0] - rect_min[:, 0]
    cov = cov_w * (rect_max[:, 1] - rect_min[:, 1])  # [N] tiles covered
    # CUDA emits duplicates only for radii > 0 (the rect of a culled
    # Gaussian still covers one tile because of the ceil); ghost entries
    # would also pick up fp32 cumsum noise as phantom gradients.
    cov = jnp.where(radius_s > 0, cov, 0)

    offs = jnp.cumsum(cov) - cov  # exclusive prefix (gaussian-major segments)
    total = jnp.sum(cov)

    # Ragged expand: entry e -> (depth-rank gi, slot j); gaussian-major order.
    #
    # PERFORMANCE NOTE: 1D random gathers of [L] elements cost ~1ms each on
    # TPU (serialized loads), so this path avoids them wherever possible:
    # - gi comes from scatter-ones + cumsum instead of a binary search
    #   (searchsorted = log2(N) such gathers);
    # - all per-rank lookups are packed into ONE [N, 4] row gather;
    # - the entry's original Gaussian index rides the sort as a payload
    #   instead of being re-gathered post-sort.
    e = jnp.arange(L, dtype=jnp.int32)
    marks = jnp.zeros((L,), jnp.int32).at[offs].add(1, mode="drop")
    gi = jnp.cumsum(marks) - 1  # == searchsorted(offs, e, 'right') - 1
    gi = jnp.clip(gi, 0, n - 1)
    valid_e = e < total

    per_rank = jnp.stack(
        [rect_min[:, 0], rect_min[:, 1], cov_w, order, offs], axis=1
    )  # [N, 5]
    pr = per_rank[gi]  # [L, 5] single row gather
    j = e - pr[:, 4]
    cw = jnp.maximum(pr[:, 2], 1)
    # j // cw via fp32: vector integer division has no TPU hardware path
    # (lowered to a slow scalar/long-form sequence). (j + 0.5) / cw floors
    # exactly for j < 2^23 and cw <= 4096: the true quotient sits at least
    # 0.5/cw from either integer, far above fp32 division error.
    q = jnp.floor((j.astype(jnp.float32) + 0.5) / cw.astype(jnp.float32)).astype(jnp.int32)
    r = j - q * cw
    tx = pr[:, 0] + r
    ty = pr[:, 1] + q
    tile_e = jnp.where(valid_e, ty * nx + tx, num_tiles).astype(jnp.int32)
    orig_e = jnp.where(valid_e, pr[:, 3], n).astype(jnp.int32)

    # Stable sort by tile id: entries are already depth-ordered, so stability
    # gives per-tile front-to-back order (== CUDA's (tile, depth) radix key
    # with stable instance tie-break). When (num_tiles+1) * L fits int32 the
    # key and the entry position are packed into ONE int32 key (automatically
    # stable); the original index rides as payload.
    if (num_tiles + 1) * L < 2**31:
        packed = tile_e * jnp.int32(L) + e
        packed_sorted, orig_sorted = jax.lax.sort((packed, orig_e), num_keys=1)
        pos_sorted = packed_sorted % jnp.int32(L)
        tile_sorted = packed_sorted // jnp.int32(L)
    else:
        tile_sorted, orig_sorted, pos_sorted = jax.lax.sort(
            (tile_e, orig_e, e), num_keys=1, is_stable=True
        )

    starts = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]

    # Inverse permutation via a second cheap sort (a sort is ~1 ms at L=800k
    # where an 800k-row scatter is ~45 ms on TPU): sorting (presort_pos,
    # iota) yields sorted-position-by-presort-position.
    _, inv_perm = jax.lax.sort((pos_sorted, e), num_keys=1)

    return TileBins(
        orig_idx_sorted=orig_sorted,
        presort_pos_sorted=pos_sorted,
        sorted_pos_of_presort=inv_perm,
        starts=starts,
        counts=counts,
        seg_offsets=offs.astype(jnp.int32),
        seg_counts=cov.astype(jnp.int32),
        order=order,
        inv_order=inv_order,
        total_entries=total,
        overflow=jnp.maximum(total - jnp.int32(L), 0),
    )
