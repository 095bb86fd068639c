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
    presort_valid: jnp.ndarray  # [L] bool: presort slot holds a real,
    # non-culled entry (culled entries keep their presort slot — the
    # gaussian-major segment layout is pre-cull — but never reach the
    # aligned stream, so their aligned_pos_of_presort is garbage and their
    # gradient contribution must be masked to zero)
    # --- per-CHUNK metadata (consumed by the STREAM kernels) ---
    tile_of_chunk: jnp.ndarray  # [nbc + 1] int32: owning tile per aligned
    # chunk; sentinel T for chunks past aligned_total (and the +1 tail slot,
    # so tile_of_chunk[c + 1] != tile_of_chunk[c] marks a tile's last chunk)
    k_of_chunk: jnp.ndarray  # [nbc] int32: chunk index within its tile's
    # segment (0 == segment head); 1 on sentinel chunks (never a head)
    row_offset: jnp.ndarray  # [] int32: global processing-grid row of this
    # bin set's row 0 (nonzero only under tile-row sharding, where each
    # device bins a contiguous row slice of the grid; tile ids here are
    # LOCAL — global tile = local + row_offset * nx)


def default_entry_budget(n: int, ptile_factor: int = 1) -> int:
    """Default tile-entry budget for N primitives: next power of two >=
    4N / ptile_factor (>= 16k). Power-of-two sizes keep the [L] sorts and
    cumsums on their fastest path; 4N covers typical 3DGS coverage (~3-5
    16px tiles per visible Gaussian), and a coarser processing tile
    (ptile_factor = ptile // tile) covers proportionally fewer (measured
    ~0.5x per doubling at 1080p/4K). Training auto-regrows on overflow (the
    guard in train/pipeline.py), so a tight default costs at most one
    recompile instead of silently truncating — the reference CUDA pipeline
    sizes this buffer exactly per frame and never truncates.

    CAVEAT (ADVICE round-3 #3): the ~0.5x-per-ptile-doubling coverage model
    holds for EWA-typical multi-tile splats; scenes dominated by sub-tile
    splats keep near-N entries regardless of ptile, so the halved default is
    tighter than the old 4N one there. Direct render() callers have no
    regrow guard — RenderOutput.overflow reports the truncation and the
    render/render_video CLIs warn loudly on it; raise entry_budget when it
    fires."""
    want = max(4 * n // max(ptile_factor, 1), 1 << 14)
    return 1 << (want - 1).bit_length()


def aligned_entry_budget(entry_budget: int, chunk: int = 128) -> int:
    """Aligned-layout budget. The pad overhead is at most (chunk - 1) per
    non-empty tile, so finer chunks need less headroom: 2x the entry budget
    at chunk 128 (measured aligned totals sit at ~2.4x entries there because
    shallow 1080p tiles pad to a full 128), 1.5x at chunk <= 32 (~1.2x
    measured). Budgets stay multiples of 1024 so stream blocks (CPB x chunk
    lanes) divide them. The training guard treats aligned overflow like
    entry overflow (regrow + recompile)."""
    # floor: one full stream block (tile_raster.CPB == 16 chunks), so the
    # stream kernels' grid = L_pad / (CPB * chunk) is never zero even for
    # deliberately tiny budgets (the overflow-guard tests use budget 16)
    floor = 16 * chunk
    if chunk <= 32:
        return max((3 * entry_budget) // 2, floor)
    return max(2 * entry_budget, floor)


def _box_min_q(mx, my, ca, cb, cc, vx, vy, x0, x1, y0, y1):
    """Exact minimum of the (convex, positive-definite) conic quadratic
    q(d) = ca dx^2 + 2 cb dx dy + cc dy^2, d = p - mean, over the pixel box
    [x0, x1] x [y0, y1]. The kernel's falloff is power = -q/2, so
    max-over-box alpha = op * exp(-qmin/2).

    If the mean lies inside the box the min is 0; otherwise (convexity) it
    lies on the boundary, and each edge's 1-D restriction is a quadratic
    whose vertex clamps into the edge interval — four closed forms.
    vx = -cb/ca and vy = -cb/cc are the precomputed vertex slopes (no
    divisions at entry scale)."""
    ax, bx = x0 - mx, x1 - mx  # dx interval
    ay, by = y0 - my, y1 - my  # dy interval
    inside = (ax <= 0.0) & (bx >= 0.0) & (ay <= 0.0) & (by >= 0.0)

    def q(dx, dy):
        return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

    def edge_x(dx):  # min over dy in [ay, by] at fixed dx
        dy = jnp.clip(vy * dx, ay, by)
        return q(dx, dy)

    def edge_y(dy):
        dx = jnp.clip(vx * dy, ax, bx)
        return q(dx, dy)

    qmin = jnp.minimum(
        jnp.minimum(edge_x(ax), edge_x(bx)),
        jnp.minimum(edge_y(ay), edge_y(by)),
    )
    return jnp.where(inside, 0.0, qmin)


def _tile_starts(tile_sorted: jnp.ndarray, num_tiles: int) -> jnp.ndarray:
    """searchsorted(tile_sorted, arange(T + 1), side='left') without the
    while loop: XLA's binary search runs log2(L) serialized rounds of
    [T]-query gathers (2.3 ms at L=512k, 10 ms at L=6.3M). Instead, sample
    every 64th key twice (two levels), locate each query's 64-wide window
    with tiny searches, then ROW-GATHER the window (64-element rows from the
    reshaped key array — the cheap gather direction on TPU) and count
    keys < query inside it. The window rows are 64-aligned by construction
    so the reshape view is exact."""
    S = 64
    L = tile_sorted.shape[0]
    if L % (S * S) != 0 or L < S * S:
        return jnp.searchsorted(
            tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
    tq = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    ns = L // S
    samples = tile_sorted[::S]  # [ns]
    samples2 = samples[::S]  # [ns // S]
    # level 2: first sample2 index with key >= t, as ONE dense [T+1, ns/S]
    # comparison + row reduce. jnp.searchsorted here lowers to log2(ns/S)
    # serialized rounds of [T+1]-element gathers (~65 us each = 1 ms/step at
    # 1080p); the dense compare is a single ~1M-element VPU fusion (~15 us).
    c2 = jnp.sum(samples2[None, :] < tq[:, None], axis=1).astype(jnp.int32)
    w2 = jnp.maximum(c2 - 1, 0)
    rows2 = samples.reshape(ns // S, S)[w2]  # [T + 1, S] row gather
    c1 = w2 * S + jnp.sum(rows2 < tq[:, None], axis=1).astype(jnp.int32)
    w1 = jnp.maximum(c1 - 1, 0)
    rows1 = tile_sorted.reshape(ns, S)[w1]  # [T + 1, S] row gather
    return (w1 * S + jnp.sum(rows1 < tq[:, None], axis=1)).astype(jnp.int32)


def bin_gaussians(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    tile: int,
    entry_budget: int,
    chunk: int = 128,
    aligned_budget: int | None = None,
    ptile: int | None = None,
    row_lo=None,
    ny_rows: int | None = None,
    tile_cull: bool = True,
) -> TileBins:
    """Bin Gaussians into (processing-)tile entry ranges.

    `tile` is the SEMANTIC tile (the CUDA 16x16 grid that defines rect
    membership); `ptile` (default == tile) is the PROCESSING tile the
    entries/kernels operate on. A coarser ptile (e.g. 32) shrinks the entry
    count ~2-3x — every [L]-scale sort/gather/scatter here scales down with
    it — while the compositing kernels recover exact semantic-tile CUDA
    semantics from the per-Gaussian rect rows in the attribute stream
    (tile_raster ROW_RECTX/ROW_RECTY).

    `row_lo`/`ny_rows` restrict binning to processing-grid rows
    [row_lo, row_lo + ny_rows): only entries touching that row slice are
    emitted and tile ids are LOCAL to it (row_offset records row_lo). This
    is the tile-row sharding hook (parallel/tiles.py): each device of a
    mesh bins + composites its own contiguous row slice. `row_lo` may be a
    traced scalar (e.g. axis_index * rows_per_device); `ny_rows` is static.
    Per-tile entry sets, depth order and chunk alignment are identical to
    an unrestricted bin of the same grid, so sharded compositing is
    bitwise-equal per tile.

    `tile_cull` (default on) drops entries whose peak alpha over their
    whole processing tile is provably below the 1/255 contribution
    threshold (exact min of the conic quadratic over the tile's pixel box,
    with a safety margin far above the kernels' fp32 noise). Such entries
    fail the kernel's per-pixel live test at EVERY pixel, so removing them
    is output- and gradient-exact; it shrinks the aligned stream the
    kernels walk (big splats cover many rect tiles whose corners are
    sub-threshold — the dominant regime at dense scale). The entry-budget
    expansion and overflow accounting stay pre-cull (conservative)."""
    if ptile is None:
        ptile = tile
    assert ptile % tile == 0 and (ptile // tile).bit_count() == 1
    fshift = (ptile // tile).bit_length() - 1
    nx = (width + ptile - 1) // ptile
    ny = (height + ptile - 1) // ptile
    if row_lo is not None:
        assert ny_rows is not None
        ny = ny_rows
    num_tiles = nx * ny
    n = proj.depth.shape[0]
    L = entry_budget

    mean2d = jax.lax.stop_gradient(proj.mean2d)
    depth = jax.lax.stop_gradient(proj.depth)

    order = depth_order(depth, proj.valid).astype(jnp.int32)  # [N] rank -> orig
    inv_order = jnp.argsort(order).astype(jnp.int32)
    # ONE packed row gather (instead of two) with barriers on both sides:
    # gathers fused into their producer (the sort) or consumer chains lower
    # to serialized scalar loops on TPU (see module docstring).
    cull_cols = []
    if tile_cull:
        # conic + per-gaussian alpha threshold for the per-(entry, tile)
        # cull: exclude iff min-over-box q > 2 ln(255 op) (+ margin); the
        # columns ride the existing packed row gather.
        conic = jax.lax.stop_gradient(proj.conic)
        op = jax.lax.stop_gradient(proj.opacity)
        thresh = 2.0 * jnp.log(jnp.maximum(255.0 * op, 1e-30))
        cull_cols = [conic, thresh[:, None]]
    packed_mr = jnp.concatenate(
        [
            mean2d,
            proj.radius.astype(jnp.float32)[:, None],
            jax.lax.stop_gradient(proj.ext).astype(jnp.float32),
            *cull_cols,
        ],
        axis=1,
    )
    packed_mr, order_b = jax.lax.optimization_barrier((packed_mr, order))
    packed_s = jax.lax.optimization_barrier(packed_mr[order_b])
    mean2d_s = packed_s[:, :2]
    radius_s = packed_s[:, 2].astype(jnp.int32)
    ext_s = packed_s[:, 3:5].astype(jnp.int32)

    # per-axis exact-equivalence extents (project.ProjectedGaussians.ext)
    # instead of the CUDA square: never-larger rect, identical output
    rect_min, rect_max = tile_rect(
        mean2d_s, ext_s[:, 0], width, height, tile, radius_y=ext_s[:, 1]
    )
    if fshift:
        # map the semantic-tile rect onto the coarser processing grid
        # (floor/ceil division via shifts — vector integer division has no
        # TPU hardware path). An axis that is EMPTY on the semantic grid
        # (fully clipped off-screen) must stay empty: the ceil of max would
        # otherwise fabricate one covered ptile when min == max is odd.
        empty = (rect_max[:, 0] <= rect_min[:, 0]) | (
            rect_max[:, 1] <= rect_min[:, 1]
        )
        rect_min = rect_min >> fshift
        rect_max = (rect_max + ((1 << fshift) - 1)) >> fshift
        rect_max = jnp.where(empty[:, None], rect_min, rect_max)
    if row_lo is not None:
        # clamp the rect's row span to this shard's slice and relabel rows
        # locally; clip is monotone so max >= min is preserved (cov_y >= 0)
        lo = jnp.asarray(row_lo, jnp.int32)
        rmin_y = jnp.clip(rect_min[:, 1], lo, lo + ny_rows) - lo
        rmax_y = jnp.clip(rect_max[:, 1], lo, lo + ny_rows) - lo
        rect_min = jnp.stack([rect_min[:, 0], rmin_y], axis=1)
        rect_max = jnp.stack([rect_max[:, 0], rmax_y], axis=1)
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

    # The three geometry fields pack into one int32 (10 bits each covers
    # tile grids up to 1024 x 1024 = 16K-pixel images): the [L, k]-wide
    # column split downstream lowers to a strided-read loop fusion costing
    # ~0.6 ms per column at L=512k, so fewer columns is a direct win.
    assert nx < 1024 and ny < 1024, "tile grid exceeds the 10-bit field packing"
    packed_geo = rect_min[:, 0] | (rect_min[:, 1] << 10) | (cov_w << 20)
    field_cols = [packed_geo, order, offs]
    if tile_cull:
        # mean/conic/threshold columns (bitcast f32 -> s32 so ONE row
        # gather broadcasts everything; row gathers pay per ROW, but the
        # broadcast gather's column split costs ~1.1 ms/column at dense
        # 4K, so every droppable column counts: the vertex slopes
        # vx = -cb/ca, vy = -cb/cc are RECOMPUTED at [L] scale (two
        # vectorized fp32 divisions ~ microseconds) instead of riding as
        # two more columns).
        cull_f = [
            packed_s[:, 0],  # mx
            packed_s[:, 1],  # my
            packed_s[:, 5],  # ca
            packed_s[:, 6],  # cb
            packed_s[:, 7],  # cc
            packed_s[:, 8],  # thresh = 2 ln(255 op)
        ]
        field_cols += [
            jax.lax.bitcast_convert_type(c, jnp.int32) for c in cull_f
        ]
    fields = jnp.stack(field_cols, axis=1).astype(jnp.int32)  # [N, 3(+6)]
    # Segment id per entry via a 1-column scatter-ones + cumsum (empty
    # segments share a position; their marks accumulate so cumsum-1 lands on
    # the LAST = owning Gaussian), then ONE row gather of the fields from
    # the small [N, 3] table. This replaces a 5-column scatter-add of field
    # STEPS (+ a [L, 5] cumsum) that measured 4.4 ms composed — the 1-column
    # scatter plus a small-source row gather is ~3x cheaper. Barriers keep
    # scatter and gather unfused from their producer chains.
    offs_b, ones_b, fields_b = jax.lax.optimization_barrier(
        (offs, jnp.ones((n,), jnp.int32), fields)
    )
    gi = (
        jnp.cumsum(
            jax.lax.optimization_barrier(
                jnp.zeros((L,), jnp.int32).at[offs_b].add(ones_b, mode="drop")
            )
        )
        - 1
    )  # [L] depth-rank segment index (== searchsorted(offs, e, 'right') - 1)
    pr = jax.lax.optimization_barrier(
        fields_b[jnp.clip(gi, 0, n - 1)]
    )  # [L, 3(+6)] segment-broadcast fields
    col = lambda i: pr[:, i]
    geo = col(0)
    j = e - col(2)
    cw = jnp.maximum(geo >> 20, 1)
    # j // cw via fp32: vector integer division has no TPU hardware path
    # (lowered to a slow scalar/long-form sequence). (j + 0.5) / cw floors
    # exactly for j < 2^23 and cw <= 4096: the true quotient sits at least
    # 0.5/cw from either integer, far above fp32 division error.
    q = jnp.floor((j.astype(jnp.float32) + 0.5) / cw.astype(jnp.float32)).astype(jnp.int32)
    r = j - q * cw
    tx = (geo & 1023) + r
    ty = ((geo >> 10) & 1023) + q
    tile_e = jnp.where(valid_e, ty * nx + tx, num_tiles).astype(jnp.int32)
    orig_e = jnp.where(valid_e, col(1), n).astype(jnp.int32)

    if tile_cull:
        # exact per-(entry, tile) peak-alpha cull: alpha over the tile's
        # pixel box is op * exp(-qmin/2); qmin > 2 ln(255 op) means the
        # kernel's alpha >= 1/255 live test fails at EVERY pixel, so the
        # entry is an exact no-op there (zero contribution AND zero
        # gradient — dead entries are live-masked in the backward too).
        # The margin (1e-2 in q ~ 0.5% in alpha at the threshold) is far
        # above the kernels' documented ~1e-5 fp32 power noise.
        f = lambda i: jax.lax.bitcast_convert_type(col(i), jnp.float32)
        mx_e, my_e, ca_e, cb_e, cc_e, thr_e = (
            f(3), f(4), f(5), f(6), f(7), f(8)
        )
        vx_e = -cb_e / jnp.where(ca_e != 0, ca_e, 1.0)
        vy_e = -cb_e / jnp.where(cc_e != 0, cc_e, 1.0)
        ty_glob = ty if row_lo is None else ty + jnp.asarray(row_lo, jnp.int32)
        px0 = (tx * ptile).astype(jnp.float32)
        py0 = (ty_glob * ptile).astype(jnp.float32)
        qmin = _box_min_q(
            mx_e, my_e, ca_e, cb_e, cc_e, vx_e, vy_e,
            px0, px0 + (ptile - 1), py0, py0 + (ptile - 1),
        )
        keep_e = valid_e & ~(qmin > thr_e + 1e-2)
        tile_e = jnp.where(keep_e, tile_e, num_tiles)
        orig_e = jnp.where(keep_e, orig_e, n)
        presort_valid = keep_e
    else:
        presort_valid = valid_e

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

    starts = _tile_starts(
        jax.lax.optimization_barrier(tile_sorted), num_tiles
    )
    counts = starts[1:] - starts[:-1]

    # --- segment-aligned relayout (see module docstring, step 5) ---
    # PERFORMANCE: everything here avoids per-slot 1D gathers ([L_pad]-sized
    # gathers cost ~6 ns/element on TPU = tens of ms). Per-slot quantities
    # are computed at CHUNK-block granularity (arrays [L_pad/chunk]) and
    # broadcast, the index relayout is ONE monotone unique-destination
    # scatter-set (the cheap direction on TPU), and the presort mapping
    # rides the existing inverse-permutation sort as an extra payload.
    # `chunk` is the alignment granularity: tile_raster.CHUNK for the v2
    # flat kernels' manual DMA windows, tile_raster.SCHUNK (also 128 —
    # narrower chunks measured slower, see STATUS) for the v3 stream
    # kernels, whose entry axis rides fp32 lanes in SCHUNK-wide slices.
    if aligned_budget is None:
        aligned_budget = aligned_entry_budget(L, chunk)
    assert aligned_budget % (16 * chunk) == 0, "aligned_budget must divide stream blocks"
    L_pad = aligned_budget
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
    astarts_b = aligned_starts[tile_b]  # [nb] gather from small [T]: cheap
    block0 = jnp.arange(nb, dtype=jnp.int32) * chunk

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
    sc_idx, sc_val = jax.lax.optimization_barrier(
        (starts[:num_tiles], delta_step)
    )
    delta_sorted = jnp.cumsum(
        jax.lax.optimization_barrier(
            jnp.zeros((L,), jnp.int32).at[sc_idx].add(sc_val, mode="drop")
        )
    )
    # CULLED entries point at aligned slot 0: the backward's routing gather
    # then reads a real (initialized) row for them, and the per-gaussian
    # segment sums subtract count * row0 afterwards (an [N]-scale fix).
    # Anything that changes the gather's shape or adds a post-gather select
    # flips XLA's gather-source layout to a ~2x slower row-major form
    # (measured: zero-row pad 1.88 ms, fused select 1.82 ms, baseline
    # 0.97 ms), so the gather must stay byte-identical to the uncull form.
    aligned_pos_of_sorted = jnp.where(
        tile_sorted < num_tiles, jnp.clip(e + delta_sorted, 0, L_pad - 1), 0
    )

    # aligned index relayout as ONE monotone SCATTER-SET [L] -> [L_pad]
    # (unique destinations; invalid/overflow entries get dest >= L_pad and
    # drop). Measured alternatives at 1080p: vmapped dynamic_slice lowers to
    # a sequential while loop (6.4 ms), element gathers cost ~7 ns/elem
    # (6.4-7.5 ms, and the flattened variant poisons the downstream attrs
    # row-gather's layout 1.9 -> 14.9 ms), whole-window lax.gathers of
    # [chunk, R] slices lower to a sequential while of dynamic-slices
    # (21 ms), and a two-stage sorted-gather + computed-index row gather
    # lets layout assignment push the transpose INTO the gather (column-
    # major writes, 4.7 ms); the scatter-set is ~1.9 ms and the direct
    # [L_pad]-row gather + separate transpose copy stay on the fast path.
    dest = jnp.where(
        (e < total) & (tile_sorted < num_tiles), e + delta_sorted, L_pad
    )
    dest_b, orig_b = jax.lax.optimization_barrier((dest, orig_sorted))
    orig_idx_aligned = jax.lax.optimization_barrier(
        jnp.full((L_pad,), n, jnp.int32).at[dest_b].set(orig_b, mode="drop")
    )

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
        presort_valid=presort_valid,
        tile_of_chunk=tile_of_chunk,
        k_of_chunk=k_of_chunk,
        row_offset=(
            jnp.asarray(row_lo, jnp.int32)
            if row_lo is not None
            else jnp.int32(0)
        ),
    )
