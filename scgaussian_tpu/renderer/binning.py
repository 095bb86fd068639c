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
     slices of the sorted entry array, no padded gather table;
  5. a SEGMENT-ALIGNED relayout of the entry indices: each tile's entries
     start at a CHUNK-multiple slot (`aligned_starts`), with sentinel pad
     slots between tiles. The compositing kernel DMAs whole chunks, and
     alignment means every chunk belongs to exactly one tile — no
     in-segment masking, no window sharing between tiles, and ~1.8x fewer
     pixel-entry cell evaluations than floor-aligned shared windows (the
     measured windows/tile of the shared layout is 1.76 vs ceil(cnt/C)
     ~1.1 here). The pad slots gather the zero sentinel attribute row
     (opacity 0), which self-excludes in the kernel's alpha test.

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
    overflow: jnp.ndarray  # [] int32 — entries beyond the L / L_pad budgets
    # --- segment-aligned relayout (consumed by the flat Pallas kernels) ---
    aligned_starts: jnp.ndarray  # [T + 1] int32: CHUNK-multiple tile starts
    orig_idx_aligned: jnp.ndarray  # [L_pad] int32: Gaussian per aligned slot
    # (sentinel N on pad slots)
    aligned_pos_of_presort: jnp.ndarray  # [L] int32: presort slot -> aligned slot
    # --- per-CHUNK metadata (consumed by the STREAM kernels) ---
    tile_of_chunk: jnp.ndarray  # [nbc + 1] int32: owning tile per aligned
    # chunk; sentinel T for chunks past aligned_total (and the +1 tail slot,
    # so tile_of_chunk[c + 1] != tile_of_chunk[c] marks a tile's last chunk)
    k_of_chunk: jnp.ndarray  # [nbc] int32: chunk index within its tile's
    # segment (0 == segment head); 1 on sentinel chunks (never a head)


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


def aligned_entry_budget(entry_budget: int) -> int:
    """Aligned-layout budget: 2x the entry budget. The pad overhead is at
    most (CHUNK - 1) per non-empty tile (~0.5M worst case at 1080p/16px
    tiles), and measured aligned totals sit at ~1.15x entries; 2x leaves
    room and keeps the power-of-two shape. The training guard treats
    aligned overflow like entry overflow (regrow + recompile)."""
    return 2 * entry_budget


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

    # Ragged expand: entry e -> (gaussian segment, slot j); gaussian-major.
    #
    # PERFORMANCE NOTE: per-entry 1D/row gathers of [L] elements cost
    # ~4-7 ns/element on TPU (serialized loads), so the per-Gaussian fields
    # are broadcast to entries WITHOUT any [L]-sized gather: the entry
    # order is gaussian-major, i.e. the broadcast index is non-decreasing,
    # so field[gi[e]] == cumsum over e of per-Gaussian field STEPS scattered
    # at segment starts (empty segments share a position; their steps
    # accumulate so the cumsum lands on the owning Gaussian's value).
    e = jnp.arange(L, dtype=jnp.int32)
    valid_e = e < total

    fields = jnp.stack(
        [rect_min[:, 0], rect_min[:, 1], cov_w, order, offs], axis=1
    ).astype(jnp.int32)  # [N, 5]
    steps = jnp.diff(fields, axis=0, prepend=jnp.zeros((1, 5), jnp.int32))
    pr = jnp.cumsum(
        jnp.zeros((L, 5), jnp.int32).at[offs].add(steps, mode="drop"), axis=0
    )  # [L, 5] segment-broadcast fields, exact in int32
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

    # --- segment-aligned relayout (see module docstring, step 5) ---
    # PERFORMANCE: everything here avoids per-slot 1D gathers ([L_pad]-sized
    # gathers cost ~6 ns/element on TPU = tens of ms). Per-slot quantities
    # are computed at CHUNK-block granularity (arrays [L_pad/chunk]) and
    # broadcast, the index relayout is a batched 128-CONTIGUOUS dynamic
    # slice (vector loads, not element gathers), and the presort mapping
    # rides the existing inverse-permutation sort as an extra payload.
    chunk = 128  # == tile_raster.CHUNK (import cycle; asserted there)
    L_pad = aligned_entry_budget(L)
    nb = L_pad // chunk
    aligned_cnt = ((counts + chunk - 1) // chunk) * chunk
    aligned_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned_cnt).astype(jnp.int32)]
    )
    aligned_total = aligned_starts[num_tiles]
    # clamp tiles that spill past the aligned budget (overflow reports it and
    # the training guard regrows; the clamp only keeps DMA windows in bounds)
    aligned_starts = jnp.minimum(aligned_starts, L_pad)
    counts = jnp.minimum(counts, L_pad - aligned_starts[:num_tiles])

    # tile id per CHUNK block via scatter-ones + cumsum: every tile marks
    # its aligned start block (empty tiles share the next real tile's
    # position; cumsum-1 lands on the LAST tile at a position — the owner).
    marks_b = (
        jnp.zeros((nb,), jnp.int32)
        .at[jnp.minimum(aligned_starts[:num_tiles], L_pad - 1) // chunk]
        .add(1, mode="drop")
    )
    tile_b = jnp.clip(jnp.cumsum(marks_b) - 1, 0, num_tiles - 1)  # [nb]
    starts_b = starts[tile_b]  # [nb] gathers from small [T] arrays: cheap
    astarts_b = aligned_starts[tile_b]
    counts_b = counts[tile_b]
    block0 = jnp.arange(nb, dtype=jnp.int32) * chunk
    # each aligned block copies a CONTIGUOUS 128-run of the sorted entries.
    # optimization_barrier: a gather fused with its producer chain lowers to
    # a serialized scalar loop on TPU (measured 8 ms fused vs 0.03 ms split).
    orig_sorted_pad = jnp.concatenate(
        [orig_sorted, jnp.full((chunk,), n, jnp.int32)]
    )
    block_src = jnp.clip(starts_b + (block0 - astarts_b), 0, L)
    block_src, orig_sorted_pad = jax.lax.optimization_barrier(
        (block_src, orig_sorted_pad)
    )
    gathered = jax.vmap(
        lambda o: jax.lax.dynamic_slice(orig_sorted_pad, (o,), (chunk,))
    )(block_src)  # [nb, chunk]
    rank_s = (
        (block0 - astarts_b)[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None, :]
    )
    valid_s = (rank_s >= 0) & (rank_s < counts_b[:, None]) & (
        (block0[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None, :])
        < aligned_total
    )
    orig_idx_aligned = jnp.where(valid_s, gathered, n).reshape(-1)

    # per-chunk stream metadata: every aligned chunk belongs to exactly one
    # tile, so the stream kernels walk chunks sequentially and reset/flush
    # per-tile state at segment boundaries flagged here.
    real_c = block0 < aligned_total
    tile_of_chunk = jnp.concatenate(
        [
            jnp.where(real_c, tile_b, num_tiles).astype(jnp.int32),
            jnp.full((1,), num_tiles, jnp.int32),
        ]
    )
    k_of_chunk = jnp.where(real_c, (block0 - astarts_b) // chunk, 1).astype(
        jnp.int32
    )

    # presort slot -> aligned slot: sorted position e sits at
    # e + (aligned_starts - starts)[tile]. The per-entry tile delta is a
    # segment broadcast = cumsum of per-tile delta STEPS scattered at tile
    # starts (duplicate positions from empty tiles accumulate to the
    # owner's delta — same trick as the expand's gi).
    delta = aligned_starts[:num_tiles] - starts[:num_tiles]  # [T] >= 0
    delta_step = jnp.diff(delta, prepend=0)
    delta_sorted = jnp.cumsum(
        jnp.zeros((L,), jnp.int32).at[starts[:num_tiles]].add(delta_step, mode="drop")
    )
    aligned_pos_of_sorted = jnp.clip(e + delta_sorted, 0, L_pad - 1)

    # Inverse permutation via a second cheap sort (a sort is ~1 ms at L=800k
    # where an 800k-row scatter is ~45 ms on TPU): sorting (presort_pos,
    # iota, aligned_pos) yields sorted-position-by-presort-position and the
    # aligned-slot-by-presort-position in one pass.
    _, inv_perm, aligned_pos_of_presort = jax.lax.sort(
        (pos_sorted, e, aligned_pos_of_sorted), num_keys=1
    )

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
        overflow=jnp.maximum(total - jnp.int32(L), 0)
        + jnp.maximum(aligned_total - jnp.int32(L_pad), 0),
        aligned_starts=aligned_starts,
        orig_idx_aligned=orig_idx_aligned,
        aligned_pos_of_presort=aligned_pos_of_presort,
        tile_of_chunk=tile_of_chunk,
        k_of_chunk=k_of_chunk,
    )
