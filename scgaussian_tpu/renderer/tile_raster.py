"""Tile-based compositing on TPU: Pallas kernel + custom VJP.

TPU-first redesign of the CUDA `renderCUDA` forward/backward
(diff_gaussian_rasterization + ashawkey depth/alpha fork — interface at
`gaussian_renderer/__init__.py:100-108`). Key idea: front-to-back alpha
compositing

    T_i = prod_{j<i} (1 - alpha_j)

is computed in log space as an *inclusive prefix sum* of log(1-alpha) via a
triangular matmul on the MXU, turning the inherently sequential per-pixel
blend into dense matrix work:

    S = L @ TRI        (L[p, c] = log1p(-alpha), TRI upper-triangular ones)
    T_before = exp(carry + S - L);  include = (carry + S) >= log(1e-4)

Transmittance is monotone non-increasing, so the CUDA early-stop rule ("the
Gaussian that would push T below 1e-4 and everything after it is excluded")
reduces to the `include` mask. Accumulation of RGB+depth is another matmul
(w @ attrs).

The shipped path is the v3 STREAM kernels (`stream_gather_composite`): the
segment-aligned entry stream from binning is walked in SCHUNK=128-entry
chunks on a BlockSpec-pipelined grid, every chunk's quadratic form is ONE
fused MXU matmul against a pixel basis, and the backward is CARRY-FREE
(forward state saved per chunk slot; strict suffixes as total - prefix) with
a scatter-free entry->Gaussian gradient reduction (cumsum segment
differences, or one lax.sort route at dense scale). A coarser PROCESSING
tile (`ptile`, default 32) shrinks every [L]-scale binning op while the
kernels replay exact 16px SEMANTIC tile rect membership per pixel from
packed rect rows.

Earlier generations (v1 padded [T, R, K] gather kernels; v2 flat manual-DMA
kernels) were deleted after the stream path subsumed them — see git history
and STATUS.md for their measured costs.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
# In-kernel matmul precision. Mosaic lowers f32 dot_generals to ONE bf16
# MXU pass by default (8-bit mantissas): measured 5% mean / 0.7 max image
# divergence vs the f32 oracle on real TPU — far outside the CUDA-parity
# contract, dominated by the quadratic form's 1/255-threshold flips.
# Mosaic supports only DEFAULT and HIGHEST (no bf16_3x HIGH), and HIGHEST
# NaN-poisons sentinel-slot lanes inside live chunks (its hi/lo operand
# split misbehaves in the full kernel context; a standalone repro is
# clean), so near-f32 matmuls are HAND-ROLLED instead: operands split into
# exact-bf16 hi/lo parts whose passes CONCATENATE along the contraction
# axis into ONE DEFAULT-precision matmul (every bf16 rounding an identity,
# f32 accumulation; see the per-site concats). SCG_KERNEL_PRECISION=fast
# restores single-pass bf16 everywhere (~0.5% images/gradients) for
# throughput experiments.
import os as _os

KERNEL_FAST = _os.environ.get("SCG_KERNEL_PRECISION", "f32") == "fast"


def _split3(x):
    """x == h + m + l, all three bf16-exact (24-bit mantissa coverage): a
    DEFAULT matmul against exact-bf16 counterparts computes full-f32
    products. Used where errors CASCADE through thresholds (the quadratic
    form's 1/255 live test, the prefix sums' sticky early-stop replay):
    the 2-term split's 2^-16 recovery measured 1.5e-2 mean image error on
    TPU purely from inclusion flips."""
    h = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - h
    m = r.astype(jnp.bfloat16).astype(jnp.float32)
    return h, m, r - m


def _split_hl(x):
    """APPROXIMATE 2-term split: x == hi + lo with hi = bf16(x) exact, but
    lo = x - hi keeps up to 16 mantissa bits and is NOT bf16-exact — the
    cross-pass matmul recovers products only to ~2^-16 relative (measured
    2.6e-3 real-TPU gradient deviation when used at a threshold-cascading
    site). Suitable ONLY for accumulate-class matmuls whose result feeds
    plain summation, never a threshold test; use _split3 for exact sites."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dotf(a, b, dims):
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32
    )
# The hi/lo passes are fused into ONE matmul by CONCATENATING the split
# terms along the CONTRACTION axis (sum over concatenated K == sum of the
# per-pass products): adding two separate in-kernel matmul results
# NaN-poisons sentinel lanes (same Mosaic misbehavior as HIGHEST), and for
# K <= 128 sites the MXU pads K to 128 anyway, making the extra terms
# FREE. Each call site builds its own term concat (the concat axis and
# the exact/split status of each operand differ per site).


ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
LOG_T_EPS = float(np.log(1e-4).astype(np.float32))

# rows of the tile_data layout. Opacity sits BEFORE the rgb+depth block so
# that rows [ROW_R, ROW_R+8) = (r, g, b, d, 0, 0, 0, 0): the forward's
# accumulator is then a single [P, 8] matmul target whose columns line up
# with the output layout (cols 0-3 = premultiplied rgb+d, cols 4-7 zero
# until logT/lastp are stored) — no lane-axis concatenation per tile.
ROW_MX, ROW_MY, ROW_CA, ROW_CB, ROW_CC, ROW_OP = 0, 1, 2, 3, 4, 5
ROW_R, ROW_G, ROW_B, ROW_D = 6, 7, 8, 9
# rows 10-13 are the zero tail of the [8]-row attrs8 matmul operand (rows
# ROW_R..ROW_R+8) and MUST stay zero; rows 14-15 hold the packed semantic-
# tile rect (see attrs_matrix) when the processing tile is coarser than the
# semantic 16px CUDA tile.
ROW_RECTX, ROW_RECTY = 14, 15
NUM_ROWS = 16  # 10 used + 4 zero-pad + 2 rect rows; multiple of the f32
# sublane tile (8) so [NUM_ROWS, C] DMA slices stay layout-aligned

# columns of the output layout [T, P, 8]
OUT_R, OUT_G, OUT_B, OUT_D, OUT_LOGT, OUT_LASTP, OUT_DONE = 0, 1, 2, 3, 4, 5, 6
G_ROWS = OUT_LOGT + 1  # cotangent rows the backward consumes (r,g,b,d,logT)


def _tri_matrix(size: int = CHUNK) -> jnp.ndarray:
    """Upper-triangular (inclusive) ones: TRI[j, i] = 1 if j <= i, so that
    (L @ TRI)[p, i] = inclusive prefix sum of L along lanes."""
    j = np.arange(size)
    return jnp.asarray((j[:, None] <= j[None, :]).astype(np.float32))


def _tri3() -> jnp.ndarray:
    """[3 SUB, SUB] = [tri; tri; tri], the prefix matmul's contraction
    concat (ONE K=96 matmul computes tri @ (xh + xm + xl) with every
    product exact — tri is 0/1 and the split terms are bf16-exact)."""
    t = _tri_matrix(SUB)
    return jnp.concatenate([t, t, t], axis=0)


def _use_interpret() -> bool:
    # Compiled Mosaic on real TPU platforms (incl. the tunneled "axon"
    # platform); interpret mode only on CPU (unit tests).
    return jax.default_backend() == "cpu"


def attrs_matrix(
    proj,
    width: int | None = None,
    height: int | None = None,
    sem_tile: int | None = None,
) -> jnp.ndarray:
    """Dense [N + 1, NUM_ROWS] attribute matrix; the +1 row is the zero
    sentinel for empty entry slots.

    With `sem_tile` (and the image size), rows ROW_RECTX/ROW_RECTY carry the
    Gaussian's CUDA getRect square rect on the SEMANTIC tile grid, packed as
    `min + 256 * (max - 1)` per axis (exact small integers in fp32; grids up
    to 256 tiles = 4096 px). The stream kernels replay the per-pixel rect
    membership test from these rows, which makes compositing at a coarser
    PROCESSING tile semantically identical to the oracle's 16px-tile
    semantics (same splat set, depth order, and thresholds; fp rounding of
    the quadratic form at the coarser tile-local origin can flip splats
    sitting exactly on the 1/255 threshold) — including the regime where
    the analytic `ext` is clamped to the 3-sigma radius and rect membership
    is genuinely semantic (CUDA renderCUDA evaluates exactly the pixels
    whose 16px tile the rect covers)."""
    from scgaussian_tpu.renderer.project import tile_rect

    zeros = jnp.zeros_like(proj.depth)
    if sem_tile is not None:
        assert width is not None and height is not None
        assert (width + sem_tile - 1) // sem_tile <= 256
        assert (height + sem_tile - 1) // sem_tile <= 256
        rmin, rmax = tile_rect(proj.mean2d, proj.radius, width, height, sem_tile)
        rectx = (rmin[:, 0] + 256 * jnp.maximum(rmax[:, 0] - 1, 0)).astype(jnp.float32)
        recty = (rmin[:, 1] + 256 * jnp.maximum(rmax[:, 1] - 1, 0)).astype(jnp.float32)
    else:
        rectx = zeros
        recty = zeros
    cols = [
        proj.mean2d[:, 0],
        proj.mean2d[:, 1],
        proj.conic[:, 0],
        proj.conic[:, 1],
        proj.conic[:, 2],
        proj.opacity,
        proj.color[:, 0],
        proj.color[:, 1],
        proj.color[:, 2],
        proj.depth,
    ]
    cols += [zeros] * (ROW_RECTX - len(cols))
    cols += [rectx, recty]
    assert len(cols) == NUM_ROWS
    attrs = jnp.stack(cols, axis=1)
    return jnp.concatenate([attrs, jnp.zeros((1, NUM_ROWS), attrs.dtype)], axis=0)


def rasterize(
    proj,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    tile: int = 16,
    entry_budget: int | None = None,
    aligned_budget: int | None = None,
    ptile: int | None = None,
    tile_cull: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full tile pipeline: bin (XLA) -> stream Pallas composite -> assemble.

    Returns (color [3,H,W], depth [1,H,W], alpha [1,H,W], overflow [] int32);
    overflow counts tile entries dropped because they exceeded entry_budget
    (0 == exact CUDA unbudgeted semantics). Gradients flow to all
    differentiable projected attributes through the scatter-free custom VJP
    of stream_gather_composite.

    `tile` is the SEMANTIC tile (CUDA's 16px rect-membership grid); `ptile`
    (default == tile) is the coarser PROCESSING tile — entries, sorts and
    gathers run on the ptile grid (~2-3x fewer of them at ptile 32) while
    the kernels replay the semantic rect test per pixel from the packed
    rect rows, keeping the output semantically identical to `tile`
    semantics (within fp noise at the 1/255 alpha threshold).
    """
    from scgaussian_tpu.renderer.binning import bin_gaussians, default_entry_budget

    if ptile is None:
        ptile = tile
    n = proj.depth.shape[0]
    if entry_budget is None:
        entry_budget = default_entry_budget(n, ptile // tile)
    # the stream kernels align tile segments at SCHUNK granularity
    bins = bin_gaussians(
        proj, width, height, tile, entry_budget,
        chunk=SCHUNK,
        aligned_budget=aligned_budget,
        ptile=ptile,
        tile_cull=tile_cull,
    )
    nx = (width + ptile - 1) // ptile
    ny = (height + ptile - 1) // ptile

    sub = tile if ptile != tile else None
    attrs = attrs_matrix(proj, width=width, height=height, sem_tile=sub)

    # [T, 5, P]: exactly the rows the image needs (r, g, b, d, logT)
    out5 = stream_gather_composite(attrs, bins, nx, ny, ptile, sub, None)
    return assemble_image(out5, bg_color, nx, ny, ptile, sub, width, height) + (
        bins.overflow,
    )


def assemble_image(out5, bg_color, nx, ny, ptile, sub, width, height):
    """Untile [T, 5, P] stream-kernel output into (color [3,H,W],
    depth [1,H,W], alpha [1,H,W])."""
    ch = OUT_LOGT + 1
    if sub is None:
        img5 = (
            out5.reshape(ny, nx, ch, ptile, ptile)
            .transpose(2, 0, 3, 1, 4)
            .reshape(ch, ny * ptile, nx * ptile)[:, :height, :width]
        )  # channels-first directly — no final transpose
    else:
        # sub-tile pixel order (qy, qx, sub, sub) — see _pix_basis.
        # PER-CHANNEL 6-axis untiles + one stack: the one-shot 7-axis
        # channel-first transpose lowers to a T(2,128)-layout copy chain
        # (9.5 ms at dense 4K); the per-channel form measures 4.2 ms.
        # AD's transpose of this (5 small reshapes, ~0.9 ms in-graph at
        # 1080p) also beats a hand-written one-shot 7-axis re-tile custom
        # VJP (1.5 ms in-graph as a T(2,128) reshape + copy chain, despite
        # 1.08 vs 1.65 standalone in tools/ubench_assembly.py) — measured
        # round 4, so don't re-take that path.
        ns = ptile // sub
        img5 = jnp.stack(
            [
                out5[:, c, :]
                .reshape(ny, nx, ns, ns, sub, sub)
                .transpose(0, 2, 4, 1, 3, 5)
                .reshape(ny * ptile, nx * ptile)
                for c in range(ch)
            ],
            axis=0,
        )[:, :height, :width]
    acc_rgb = img5[OUT_R : OUT_B + 1]  # [3, H, W]
    acc_d = img5[OUT_D]
    T_fin = jnp.exp(img5[OUT_LOGT])
    color_out = acc_rgb + T_fin[None] * bg_color[:, None, None]
    return color_out, acc_d[None], (1.0 - T_fin)[None]


POWER_EPS = 1e-4
_NQ = 8  # quadratic basis rows [1, px, py, px^2, px*py, py^2, 0, 0]


def _pix_basis_block(tilesize: int, pblk: int, sub: int | None = None):
    """[pblk, _NQ] BLOCK-LOCAL pixel basis, shared by EVERY pixel block:
    columns [1, bx, by, bx^2, bx*by, by^2, 0, 0] where (bx, by) are the
    pixel's coordinates WITHIN its block — a sub x sub square in semantic
    sub-tile mode (pixel order (qy, qx, ly%sub, lx%sub), so each block is
    exactly one semantic sub-tile and rect membership stays a per-(entry,
    block) row constant), a row strip of the tile otherwise. The block's
    tile-local origin moves into the COEFFICIENT rows instead (see
    _stream_block_alpha), which the 3-term coef split recovers f32-exactly.

    Why block-local (round-5 finding): every basis entry is a small integer
    (<= 15^2 = 225 — enforced by the side <= 16 assert), EXACTLY
    representable in bf16, so the quadratic-form matmul needs NO basis
    split. The former tile-local basis (values up to 31^2) rode a hi/lo
    split as a 6-piece contraction concat, and Mosaic silently DROPPED its
    low-half lanes in the full kernel context: compiled ptile=32 output
    equaled a pl=0 kernel bitwise-at-noise while interpret mode computed
    the true product (~1.6e-2 mean image divergence invisible to every CPU
    test; caught by bench.py's on-TPU parity gate). 3-piece concats are
    verified clean on-TPU; 6-piece are not — do not reintroduce one."""
    side = sub if sub is not None else tilesize
    assert side <= 16, "pixel-block side must be <= 16 (bf16-exact basis)"
    assert pblk % side == 0
    p = jax.lax.broadcasted_iota(jnp.int32, (pblk, 1), 0)
    lx = (p % side).astype(jnp.float32)
    ly = (p // side).astype(jnp.float32)
    one = jnp.ones((pblk, 1), jnp.float32)
    zero = jnp.zeros((pblk, 1), jnp.float32)
    return jnp.concatenate(
        [one, lx, ly, lx * lx, lx * ly, ly * ly, zero, zero], axis=1
    )  # [pblk, _NQ]


def _aligned_attrsT(attrs, bins):
    """Segment-aligned [R, L_pad] attribute stream for the Pallas kernels.

    ONE [L_pad]-row gather (attrs by the scatter-set aligned index; pad
    slots hit the zero sentinel row of attrs) plus a separate transpose
    copy. Measured negative alternatives at 1080p: whole-window lax.gathers
    lower to a sequential while loop of dynamic-slices (21 ms), and a
    two-stage sorted-gather + computed-index row gather lets XLA layout
    assignment push the transpose INTO the gather (column-major writes,
    4.7 ms vs 1.9 + 0.8 here).

    optimization_barrier: XLA fuses gathers with adjacent transposes /
    producer chains into serialized scalar-load loops (measured 4.6 ms for
    one such line fused vs 0.06 ms split); the barriers keep the gather
    and the transpose separate, vectorized ops.
    """
    aligned_attrs = attrs[jax.lax.optimization_barrier(bins.orig_idx_aligned)]
    aligned_attrs = jax.lax.optimization_barrier(aligned_attrs)
    return aligned_attrs.T  # [R, L_pad]



# --------------------------------------------------------------------------
# v3 "stream" kernels: the grid walks the SEGMENT-ALIGNED entry stream in
# fixed blocks of CPB chunks, with ALL I/O on BlockSpec auto-pipelining —
# no manual input DMA at all. This removes the v2 kernels' dominant cost:
# with ~50 entries per tile at 1080p, the per-tile manual chunk DMAs are
# cold latency stalls (~1.5 us x 8160 tiles ~ the whole 12 ms forward);
# the stream grid instead prefetches 16-chunk blocks ahead of compute.
#
# Work layout is fully TRANSPOSED vs v2: entries on SUBLANES, pixels on
# LANES ([C=128, P=256]). Per-pixel compositing state (logT, done, acc,
# lastp) is then naturally [1, P] / [8, P] rows, carried across chunks and
# grid steps in VMEM scratch (the sequential TPU grid makes this legal),
# and the per-chunk output block [CPB, 8, P] has no lane padding. Per-tile
# boundaries come from binning's per-chunk metadata (tile_of_chunk,
# k_of_chunk): state resets at k_of_chunk == 0 and every chunk writes the
# running state to its out slot, so a tile's final state is simply the slot
# of its LAST chunk (gathered afterwards in XLA — an [T]-row gather of
# cheap 8 KB rows).
#
# The alpha computation avoids every [C, 1] broadcast the transposed
# layout would otherwise need: alpha = op * exp(min(power, 0)) is
# evaluated as exp(powop - relu(power)) where powop = power + log(op) comes
# from a SECOND quadratic-basis matmul whose constant row is a0 + log(op)
# — log of the per-entry opacity row is 128 transcendentals per chunk
# (vs 32k per-cell), and the zero sentinel row yields log(0) = -inf =>
# alpha = 0, which keeps pad slots self-excluding. The within-chunk prefix
# sum of log(1-alpha) is the same triangular MXU matmul as v1/v2, contracted
# on the ENTRY (sublane) axis.
#
# The backward is CARRY-FREE: the forward saves its running state (acc,
# logT, done) at EVERY chunk slot, so each backward chunk reads its entry
# state from the previous chunk's saved slot (a shifted second BlockSpec on
# the same array) and reconstructs the strict suffix sums as
# total_tile - (g . acc_entry + in-chunk prefix). No cross-chunk carries,
# no last-contributor bookkeeping — chunks are fully independent and Mosaic
# can overlap their matmul/VPU chains. gout and the per-tile gww totals
# arrive CHUNK-GATHERED ([nbc, *, P] XLA row-gathers of 1-8 KB rows) so
# they ride the same auto-pipeline; the gradient tail runs in ROW space
# ([k, C] rows, entries on lanes) and dT is born [NUM_ROWS, L_pad], with
# one XLA transpose feeding the routing gather.
# --------------------------------------------------------------------------

SCHUNK = 128  # stream-kernel chunk (entries per prefix-sum block).
# MEASURED NEGATIVE RESULTS: SCHUNK=32 made the forward 2.6x slower and
# SCHUNK=64 +120%/+50% (at CPB 16/32) EVEN AT EQUAL CELL COUNT — per-chunk
# and per-grid-step overheads dominate under 128, so the ~2.4x intra-tile
# padding at 1080p (tiles average ~50 entries) stays. SCHUNK=64 also trips
# a Mosaic limitation (sublane concat of pieces with lane offsets 0 vs 64).
# Keep 128; the code stays parameterized for future hardware.
CPB = 16  # chunks per stream block (one grid step)
SUB = 32  # sub-chunk width of the hierarchical prefix/suffix (fp32 sublane
# tile is 8, so 32-sublane slices stay layout-aligned)
PBLK = 256  # pixel-block width: chunks evaluate pixels in [C, PBLK] blocks
# so a 32x32 processing tile (P=1024) keeps the same per-op working set
# (and Mosaic register pressure) as the 16x16 baseline


def _prefix_sublanes(x, tri3):
    """Inclusive prefix sum of x [SCHUNK, P] along SUBLANES via NSUB
    independent [SUB, SUB] triangular matmuls + a cheap carry combine —
    SCHUNK/SUB times fewer MXU MACs than one [SCHUNK, SCHUNK] triangular
    matmul (the tri matmuls dominate the stream kernels' MXU work)."""
    nsub = SCHUNK // SUB
    pieces = []
    carry = None
    for g in range(nsub):
        xg = x[g * SUB : (g + 1) * SUB, :]
        if KERNEL_FAST:
            sg = _dotf(tri3[:SUB], xg, (((0,), (0,)), ((), ())))
        else:
            xh, xm, xl = _split3(xg)
            xcat = jnp.concatenate([xh, xm, xl], axis=0)  # [3 SUB, P]
            # tri3 = [tri; tri; tri]: ONE K=96 matmul == the exact f32
            # prefix (tri is 0/1; the split terms are bf16-exact). Full
            # 24-bit recovery: the prefix feeds the sticky early-stop.
            sg = _dotf(tri3, xcat, (((0,), (0,)), ((), ())))
        pieces.append(sg if carry is None else sg + carry)
        tot = sg[SUB - 1 : SUB, :]
        carry = tot if carry is None else carry + tot
    return jnp.concatenate(pieces, axis=0)



PEN_BIG = 1e9  # added to `power` for pixels outside the semantic rect: far
# above POWER_EPS so the standard power test excludes them exactly (replaying
# CUDA rect membership), far below fp32 overflow when summed with any real
# quadratic-form value (|a0| < ~1e8 at 4K image scale)


def _pix_basis3(tilesize: int, pblk: int, sub: int | None = None):
    """[pblk, 3 _NQ] = [pb | pb | pb]: the bf16-exact block-local basis
    replicated for the quadratic-form matmul's 3-term coef contraction
    concat [ch; cm; cl] — all products exact, f32 accumulation. The fast
    path reads only the first _NQ columns."""
    pb = _pix_basis_block(tilesize, pblk, sub)
    return jnp.concatenate([pb, pb, pb], axis=1)


def _pix_basis_mt(tilesize: int, pblk: int, sub: int | None = None):
    """[2 pblk, _NQ] = [pb; pb] basis for the backward's mt matmul, whose
    d_power operand rides a 2-term hi/lo split ([dph, dpl] lane concat):
    products pb * dph and pb * dpl are exact (pb is bf16-exact), recovering
    pb * d_power to ~2^-24 — accumulate-class precision (mt feeds plain
    per-entry moment sums, never a threshold)."""
    pb = _pix_basis_block(tilesize, pblk, sub)
    return jnp.concatenate([pb, pb], axis=0)


def _stream_entry_coefs(ablk_ref, sl, bx, by, sub):
    """Per-chunk, per-entry raw rows for the quadratic-form evaluation:
    returns (logop,), the unpacked rect bounds (or None) and the geometry
    rows (tile-local mean offsets + conic + opacity). The coefficient rows
    themselves are built PER PIXEL BLOCK by _stream_block_alpha: the basis
    is block-local (bf16-exact), so the block origin must fold into the
    coefficients."""
    mx = ablk_ref[ROW_MX : ROW_MX + 1, sl] - bx  # [1, C] tile-local
    my = ablk_ref[ROW_MY : ROW_MY + 1, sl] - by
    ca = ablk_ref[ROW_CA : ROW_CA + 1, sl]
    cb = ablk_ref[ROW_CB : ROW_CB + 1, sl]
    cc = ablk_ref[ROW_CC : ROW_CC + 1, sl]
    op = ablk_ref[ROW_OP : ROW_OP + 1, sl]
    # clamp keeps the zero sentinel row FINITE: log(0) = -inf NaN-poisons
    # the split-matmul quadratic form (the hi/lo operand split computes
    # -inf - (-inf) = NaN, and NaN x one-hot-0 stays NaN). 1e-37 is a
    # NORMAL f32 (1e-38 is subnormal and flush-to-zero turned the clamp
    # into a no-op); exp(-85 + power) == 0 in fp32 for every real power,
    # so sentinel alpha is still exactly 0.
    logop = jnp.log(jnp.maximum(op, 1e-37))
    if sub is None:
        rect = None
    else:
        # Unpack the semantic-tile rect rows (min + 256 * (max - 1) per
        # axis; exact small integers in fp32, and 1/256 is a power of two
        # so the floor division is exact).
        rx = ablk_ref[ROW_RECTX : ROW_RECTX + 1, sl]
        ry = ablk_ref[ROW_RECTY : ROW_RECTY + 1, sl]
        maxx1 = jnp.floor(rx * (1.0 / 256.0))
        minx = rx - 256.0 * maxx1
        maxy1 = jnp.floor(ry * (1.0 / 256.0))
        miny = ry - 256.0 * maxy1
        rect = (minx, maxx1, miny, maxy1)
    return (logop,), rect, (mx, my, ca, cb, cc, op)


def _stream_block_alpha(parts, geo, rect, pixb, obx, oby, gx, gy):
    """Evaluate one chunk's entries against one [PB, 3 _NQ] block-local
    pixel-basis block with tile-local block origin (obx, oby): returns
    ([C, PB]) alpha (live-masked), alpha_pre, live, power, and the
    BLOCK-local mean offsets (mxb, myb) the backward's moment conversion
    needs.

    When `rect` is set, the block covers exactly ONE semantic sub-tile
    (see _pix_basis_block) at global semantic-grid coordinates (gx, gy), so
    rect membership is a per-entry row constant: outside entries get
    PEN_BIG added to a0, which drives `power` past POWER_EPS and excludes
    them via the standard live test — zero extra matmul work vs the
    baseline.

    Notes on Mosaic layouts: every concat operand must share the source
    slices' vector layout — tail rows reuse sliced quantities (a1/a2)
    rather than jnp.zeros, because constants carry lane offset 0 while
    SCHUNK-offset slices carry offset j*SCHUNK and Mosaic rejects sublane
    concats with mismatched lane offsets. Tail rows 6-7 are annihilated by
    pixb's zero columns 6-7.

    ONE fused matmul for both quadratic forms: (power, power + log op)
    stack on the LANE axis so a single MXU pass yields [2C, PB] — one
    dependent-matmul latency chain per block instead of two."""
    (logop,) = parts
    mx, my, ca, cb, cc, op = geo
    mxb = mx - obx  # [1, C] BLOCK-local mean offset
    myb = my - oby
    a1 = ca * mxb + cb * myb
    a2 = cc * myb + cb * mxb
    a0 = -0.5 * (ca * mxb * mxb + cc * myb * myb) - cb * mxb * myb
    if rect is not None:
        minx, maxx1, miny, maxy1 = rect
        outside = (gx < minx) | (maxx1 < gx) | (gy < miny) | (maxy1 < gy)
        a0 = a0 + jnp.where(outside, PEN_BIG, 0.0)
    rows = [
        [a1, a1],
        [a2, a2],
        [-0.5 * ca, -0.5 * ca],
        [-cb, -cb],
        [-0.5 * cc, -0.5 * cc],
        [a1, a1],  # annihilated by pixb's zero columns 6-7
        [a2, a2],
    ]
    tail = jnp.concatenate(
        [jnp.concatenate(r, axis=1) for r in rows], axis=0
    )  # [7, 2C]
    coef = jnp.concatenate(
        [jnp.concatenate([a0, a0 + logop], axis=1), tail], axis=0
    )  # [_NQ, 2C]
    # pixb carries [pb x3] (bf16-exact block-local basis, _pix_basis3); the
    # 3-term coef concat [ch; cm; cl] computes the FULL-f32 product in ONE
    # K=24 matmul — free on the MXU (K pads to 128). Full 24-bit coef
    # recovery matters: power feeds the 1/255 live test whose flips cascade
    # into the sticky early-stop (2-term recovery measured 1.5e-2 mean
    # image error). Do NOT fold a basis split back in here: the former
    # 6-piece concat was silently mis-lowered by Mosaic (see
    # _pix_basis_block).
    if KERNEL_FAST:
        pp = _dotf(coef, pixb[:, :_NQ], (((0,), (1,)), ((), ())))
    else:
        ch, cm, cl = _split3(coef)
        coef_cat = jnp.concatenate([ch, cm, cl], axis=0)  # [3 _NQ, 2C]
        pp = _dotf(coef_cat, pixb, (((0,), (1,)), ((), ())))  # [2C, PB]
    C = a0.shape[1]
    power = pp[:C]
    powop = pp[C:]
    # == op * exp(min(power, 0)); the exponent is mathematically <= 0
    # (it equals logop + min(power, 0)), but for rect-outside pixels both
    # quadratic forms carry PEN_BIG ~ 1e9 and their fp difference can land
    # ~ +-1e2 — the explicit min keeps exp() from overflowing to inf there
    # (0 * inf = NaN in the backward's d_power)
    alpha_pre = jnp.exp(jnp.minimum(powop - jnp.maximum(power, 0.0), 0.0))
    alpha = jnp.minimum(ALPHA_MAX, alpha_pre)
    live = jnp.where((power <= POWER_EPS) & (alpha >= ALPHA_MIN), 1.0, 0.0)
    alpha = alpha * live
    return alpha, alpha_pre, live, power, (mxb, myb)


def _stream_fwd_kernel(
    nx: int, tilesize: int, T_total: int, sub: int | None,
    tile_c_ref, k_c_ref,
    tri_ref, pixb_ref, ablk_ref,
    out_ref,
    st_acc, st_logT, st_done,
):
    i = pl.program_id(0)
    # BRANCHLESS chunk bodies: the previous @pl.when guards (segment-head
    # state reset; skip of sentinel / fully-early-stopped chunks) serialized
    # the unrolled loop — every chunk's 3 dependent matmuls waited on the
    # previous chunk's control flow. Resets are a multiply by a 0/1 keep
    # flag, sentinel chunks compute against the zero sentinel attribute rows
    # (alpha == 0 => exact no-op on the carried state), and the early-stop
    # remains exact through the `inc` mask. This lets Mosaic overlap the
    # matmul chains of adjacent chunks.
    #
    # FULLY-SENTINEL grid steps (all CPB chunks past aligned_total — budget
    # slack) skip the whole body: ONE uniform branch per 16 chunks does not
    # serialize the live steps' pipelines (unlike the per-chunk guards
    # above), their out slots are never read (the image gathers real tiles'
    # last chunks; empty tiles select 0 via a NaN-safe where), and the slack
    # in default budgets stops costing kernel time. Sentinels are a SUFFIX
    # of the chunk axis, so first-chunk-sentinel == all-sentinel.
    @pl.when(tile_c_ref[i * CPB] < T_total)
    def _live_block_fwd():
        _stream_fwd_block(
            nx, tilesize, T_total, sub, tile_c_ref, k_c_ref, tri_ref,
            pixb_ref, ablk_ref, out_ref, st_acc, st_logT, st_done, i,
        )


def _stream_fwd_block(
    nx, tilesize, T_total, sub, tile_c_ref, k_c_ref, tri_ref, pixb_ref,
    ablk_ref, out_ref, st_acc, st_logT, st_done, i,
):
    P = tilesize * tilesize
    # In semantic sub-tile mode each pixel block must cover exactly ONE
    # sub*sub semantic tile (the rect test is a per-block row constant);
    # PBLK is only the working-set target for the sub-free path. With the
    # default tile=16 these coincide (16*16 == PBLK == 256).
    pblk = sub * sub if sub is not None else min(P, PBLK)
    for j in range(CPB):
        c = i * CPB + j
        t = tile_c_ref[c]
        k_in = k_c_ref[c]
        # reset by SELECTION, not multiplication: the scratch is
        # uninitialized garbage before the first segment head, and
        # NaN * 0 == NaN would poison the whole stream
        head = k_in == 0
        sl = pl.ds(j * SCHUNK, SCHUNK)
        tt = jnp.minimum(t, T_total - 1)  # sentinel chunks hit sentinel rows
        bx = ((tt % nx) * tilesize).astype(jnp.float32)
        by = ((tt // nx) * tilesize).astype(jnp.float32)
        parts, rect, geo = _stream_entry_coefs(ablk_ref, sl, bx, by, sub)
        attrs8 = ablk_ref[ROW_R : ROW_R + 8, sl]  # [8, C]
        if not KERNEL_FAST:
            ah, al = _split_hl(attrs8)
            attrs_cat = jnp.concatenate([ah, al, ah], axis=1)  # [8, 3C]
        nsx = 1 if sub is None else tilesize // sub
        for pb in range(P // pblk):
            psl = slice(pb * pblk, (pb + 1) * pblk)
            gx = gy = None
            if sub is not None:
                # block pb = semantic sub-tile (qy, qx); global coords
                gx = bx * (1.0 / sub) + (pb % nsx)
                gy = by * (1.0 / sub) + (pb // nsx)
                obx = float((pb % nsx) * sub)  # tile-local block origin
                oby = float((pb // nsx) * sub)
            else:
                obx = 0.0
                oby = float(pb * (pblk // tilesize))
            logT = jnp.where(head, 0.0, st_logT[:, psl])  # [1, PB]
            done = jnp.where(head, 0.0, st_done[:, psl])
            acc_in = jnp.where(head, 0.0, st_acc[:, psl])
            alpha, *_ = _stream_block_alpha(
                parts, geo, rect, pixb_ref[...], obx, oby, gx, gy
            )
            l = jnp.log1p(-alpha)  # [C, PB]
            # inclusive prefix over entries (sublanes)
            S = _prefix_sublanes(l, tri_ref[:])
            logT_after = logT + S
            inc = jnp.where(logT_after >= LOG_T_EPS, 1.0, 0.0) * (1.0 - done)
            T_before = jnp.exp(logT_after - l)
            w = alpha * T_before * inc  # [C, PB]
            if KERNEL_FAST:
                acc_add = _dotf(attrs8, w, (((1,), (0,)), ((), ())))
            else:
                wh, wl = _split_hl(w)
                acc_add = _dotf(
                    attrs_cat,  # [8, 3C] = [ah | al | ah] (hoisted)
                    jnp.concatenate([wh, wh, wl], axis=0),  # [3C, PB]
                    (((1,), (0,)), ((), ())),
                )
            st_acc[:, psl] = acc_in + acc_add
            st_logT[:, psl] = logT + jnp.sum(l * inc, axis=0, keepdims=True)
            st_done[:, psl] = jnp.maximum(
                done,
                jnp.where(logT_after[SCHUNK - 1 : SCHUNK, :] < LOG_T_EPS, 1.0, 0.0),
            )
            # (last-contributor tracking removed: the carry-free backward
            # replays inclusion from the saved (logT, done) state instead)
            out_ref[j, 0:8, psl] = st_acc[:, psl]
            out_ref[j, OUT_LOGT : OUT_LOGT + 1, psl] = st_logT[:, psl]
            out_ref[j, OUT_DONE : OUT_DONE + 1, psl] = st_done[:, psl]


def _stream_bwd_kernel(
    nx: int, tilesize: int, T_total: int, grid: int, sub: int | None,
    tile_c_ref, k_c_ref,
    tri_ref, pixb_ref, pixbmt_ref, ablk_ref, outblk_ref, prevblk_ref,
    gblk_ref,
    totblk_ref,
    dblk_ref,
):
    """CARRY-FREE backward: every chunk is independent.

    The forward stream saves its running state (acc, logT, done) to HBM at
    EVERY chunk slot, so chunk c's entry state is chunk c-1's saved state
    (zeros at a segment head). The strict-suffix sums the gradient needs,
    A_i = sum_{j>i} g_w_j w_j, become

        A_i = total_tile - (g . acc_entry + in-chunk inclusive prefix_i)

    where total_tile = g . acc_final is per-tile (precomputed in XLA and
    chunk-gathered). With no cross-chunk carries the unrolled chunk bodies
    have no sequential dependency at all, so Mosaic can overlap adjacent
    chunks' matmul/VPU chains — the old reverse-walk formulation serialized
    on its suffixL/suffixA scratch carries. Inclusion needs no
    last-contributor bookkeeping either: inc replays the forward's exact
    test from the saved (logT, done) entry state.

    FULLY-SENTINEL grid steps skip the whole body (see _stream_fwd_kernel):
    their dblk slots are never routed (the routing gather only reads
    aligned positions of real presort entries, and invalid presort slots
    select 0 via a NaN-safe where in _stream_gather_bwd)."""
    i = pl.program_id(0)

    @pl.when(tile_c_ref[i * CPB] < T_total)
    def _live_block_bwd():
        _stream_bwd_block(
            nx, tilesize, T_total, sub, tile_c_ref, k_c_ref, tri_ref,
            pixb_ref, pixbmt_ref, ablk_ref, outblk_ref, prevblk_ref,
            gblk_ref, totblk_ref, dblk_ref, i,
        )


def _stream_bwd_block(
    nx, tilesize, T_total, sub, tile_c_ref, k_c_ref, tri_ref, pixb_ref,
    pixbmt_ref, ablk_ref, outblk_ref, prevblk_ref, gblk_ref, totblk_ref,
    dblk_ref, i,
):
    P = tilesize * tilesize
    pblk = sub * sub if sub is not None else min(P, PBLK)  # see _stream_fwd_block
    for j in range(CPB):
        c = i * CPB + j
        t = tile_c_ref[c]
        k_in = k_c_ref[c]
        # entry state: previous chunk's saved forward state; zeros at a
        # segment head (selection, not multiplication: the j==0 read of the
        # neighbor block is junk for head chunks)
        head = k_in == 0
        prev = outblk_ref[j - 1] if j > 0 else prevblk_ref[0]  # [8, P]

        sl = pl.ds(j * SCHUNK, SCHUNK)
        dsl = sl

        if True:
            tt = jnp.minimum(t, T_total - 1)
            bx = ((tt % nx) * tilesize).astype(jnp.float32)
            by = ((tt // nx) * tilesize).astype(jnp.float32)
            parts, rect, geo_rows = _stream_entry_coefs(ablk_ref, sl, bx, by, sub)
            attrs8 = ablk_ref[ROW_R : ROW_R + 8, sl]  # [8, C]
            # per-block moment accumulators, already converted to the
            # origin-invariant r_* forms (the basis is BLOCK-local, so raw
            # moments from different blocks have different origins and can
            # NOT be summed before conversion)
            S0 = r_dx = r_dy = r_dxdx = r_dydy = r_dxdy = None
            d_attrs_rows = None
            nsx = 1 if sub is None else tilesize // sub
            for pb in range(P // pblk):
                # plain static slice: indexes refs AND the materialized
                # `prev` array (pl.ds only works on refs)
                psl = slice(pb * pblk, (pb + 1) * pblk)
                gx = gy = None
                if sub is not None:
                    gx = bx * (1.0 / sub) + (pb % nsx)
                    gy = by * (1.0 / sub) + (pb // nsx)
                    obx = float((pb % nsx) * sub)
                    oby = float((pb // nsx) * sub)
                else:
                    obx = 0.0
                    oby = float(pb * (pblk // tilesize))
                pixb = pixb_ref[...]  # [PB, 3 _NQ] (shared per-block table)
                logT_e = jnp.where(head, 0.0, prev[OUT_LOGT : OUT_LOGT + 1, psl])
                done_e = jnp.where(head, 0.0, prev[OUT_DONE : OUT_DONE + 1, psl])
                accdot = jnp.where(
                    head,
                    0.0,
                    jnp.sum(
                        gblk_ref[j, 0:4, psl] * prev[0:4, psl],
                        axis=0,
                        keepdims=True,
                    ),
                )  # [1, PB] inclusive-prefix of gww through chunk c-1
                alpha, alpha_pre, live, power, (mxb, myb) = _stream_block_alpha(
                    parts, geo_rows, rect, pixb, obx, oby, gx, gy
                )
                g8 = gblk_ref[j, :, psl]  # [G_ROWS, PB] (r, g, b, d, logT)
                g_logT = gblk_ref[j, OUT_LOGT : OUT_LOGT + 1, psl]
                total = totblk_ref[j, :, psl]  # [1, PB] per-tile sum of gww
                l = jnp.log1p(-alpha)
                # replay the forward's exact inclusion test (unmasked
                # in-chunk prefix + entry logT/done)
                S = _prefix_sublanes(l, tri_ref[:])
                logT_after = logT_e + S
                inc = jnp.where(logT_after >= LOG_T_EPS, 1.0, 0.0) * (1.0 - done_e)
                T_before = jnp.exp(logT_after - l)
                w = alpha * T_before * inc
                if KERNEL_FAST:
                    g_w = _dotf(
                        attrs8[0:G_ROWS], g8, (((0,), (0,)), ((), ()))
                    )
                else:
                    a5h, a5l = _split_hl(attrs8[0:G_ROWS])
                    g8h, g8l = _split_hl(g8)
                    g_w = _dotf(
                        jnp.concatenate([a5h, a5l, a5h], axis=0),
                        jnp.concatenate([g8h, g8h, g8l], axis=0),
                        (((0,), (0,)), ((), ())),
                    )  # [C, PB]  (row 4 of the operand is a zero attr row,
                # so the logT cotangent cannot leak into g_w)
                gww = g_w * w  # w carries inc
                prefA = accdot + _prefix_sublanes(gww, tri_ref[:])  # inclusive
                A = total - prefA  # strict suffix over j > i
                # live masks d_alpha: dead entries (alpha < 1/255 or
                # power > 0) have alpha == 0 but alpha_pre != 0, and would
                # otherwise leak gradient through d_power = d_alpha * alpha_pre
                d_alpha = (g_w * T_before - (A + g_logT) / (1.0 - alpha)) * (inc * live)
                # CUDA convention: the 0.99 cap is ignored in the backward;
                # op * G == alpha_pre (uncapped)
                d_power = d_alpha * alpha_pre
                # EVERYTHING below stays in ROW space ([k, C]: entries on
                # lanes); per-pixel-block partial sums accumulate in
                # registers across the pixel blocks.
                if KERNEL_FAST:
                    da = _dotf(g8, w, (((1,), (1,)), ((), ())))
                    mt = _dotf(
                        pixb[:, :_NQ], d_power, (((0,), (1,)), ((), ()))
                    )
                else:
                    wh, wl = _split_hl(w)
                    dph, dpl = _split_hl(d_power)
                    da = _dotf(
                        jnp.concatenate([g8h, g8l, g8h], axis=1),
                        jnp.concatenate([wh, wh, wl], axis=1),
                        (((1,), (1,)), ((), ())),
                    )  # [G_ROWS, C] (row 4 = g_logT * w, never routed:
                    # R_USED stops at ROW_D)
                    # per-entry pixel moments via the block-local basis:
                    # mt[b, c] = sum_p pixb[p, b] * d_power[c, p]; pb is
                    # bf16-exact so only d_power splits ([pb; pb] x
                    # [dph, dpl] — accumulate-class 2-term recovery)
                    mt = _dotf(
                        pixbmt_ref[...],
                        jnp.concatenate([dph, dpl], axis=1),
                        (((0,), (1,)), ((), ())),
                    )  # [_NQ, C]
                d_attrs_rows = da if d_attrs_rows is None else d_attrs_rows + da
                # convert this block's moments to the origin-invariant r_*
                # sums with the BLOCK-local mean (mxb, myb) before
                # accumulating: r_dx == sum_p (mean_x - pix_x) d_power etc.
                # hold per block regardless of basis origin
                S0_b, Sx_b, Sy_b = mt[0:1], mt[1:2], mt[2:3]
                Sxx_b, Sxy_b, Syy_b = mt[3:4], mt[4:5], mt[5:6]
                acc = [
                    S0_b,
                    mxb * S0_b - Sx_b,
                    myb * S0_b - Sy_b,
                    mxb * mxb * S0_b - 2.0 * mxb * Sx_b + Sxx_b,
                    myb * myb * S0_b - 2.0 * myb * Sy_b + Syy_b,
                    mxb * myb * S0_b - mxb * Sy_b - myb * Sx_b + Sxy_b,
                ]
                if S0 is None:
                    S0, r_dx, r_dy, r_dxdx, r_dydy, r_dxdy = acc
                else:
                    S0 = S0 + acc[0]
                    r_dx = r_dx + acc[1]
                    r_dy = r_dy + acc[2]
                    r_dxdx = r_dxdx + acc[3]
                    r_dydy = r_dydy + acc[4]
                    r_dxdy = r_dxdy + acc[5]
            mx, my, ca, cb, cc, op = geo_rows  # [1, C] tile-local rows
            d_op_row = jnp.where(op > 0.0, S0 / op, 0.0)

            dgeo = jnp.concatenate(
                [
                    -(ca * r_dx + cb * r_dy),
                    -(cc * r_dy + cb * r_dx),
                    -0.5 * r_dxdx,
                    -r_dxdy,
                    -0.5 * r_dydy,
                    d_op_row,
                ],
                axis=0,
            )  # [6, C] (ROW_MX..ROW_OP)
            # dT is born [NUM_ROWS, L_pad] (row-major); ONE XLA transpose
            # before the routing gather replaces 8192 in-kernel transposes.
            if SCHUNK % 128 == 0:
                # one full-width store (8 separate stores measured +0.6 ms)
                zeros2 = jnp.zeros(
                    (NUM_ROWS - ROW_R - G_ROWS, SCHUNK), jnp.float32
                )
                dblk_ref[:, dsl] = jnp.concatenate(
                    [dgeo, d_attrs_rows, zeros2], axis=0
                )
            else:
                # dgeo carries the SCHUNK-offset lane layout of its source
                # slices while the matmul-born d_attrs_rows carries offset
                # 0; Mosaic rejects sublane concats with mismatched lane
                # offsets when SCHUNK is not a 128-lane-tile multiple, so
                # store the pieces separately (measured SCHUNK=64 is slower
                # overall anyway — this branch just keeps it functional).
                dblk_ref[0:ROW_R, dsl] = dgeo
                dblk_ref[ROW_R : ROW_R + G_ROWS, dsl] = d_attrs_rows
                dblk_ref[ROW_R + G_ROWS : NUM_ROWS, dsl] = jnp.zeros(
                    (NUM_ROWS - ROW_R - G_ROWS, SCHUNK), jnp.float32
                )


def _stream_fwd_impl(attrsT, tile_of_chunk, k_of_chunk, nx, t_total, tilesize, sub=None):
    R, Lpad = attrsT.shape
    nbc = Lpad // SCHUNK
    grid = Lpad // (CPB * SCHUNK)
    P = tilesize * tilesize
    T_total = t_total  # GLOBAL tile count (tile ids may carry a row offset
    # under tile-row sharding; sentinel chunks carry id == T_total)
    pblk = sub * sub if sub is not None else min(P, PBLK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3 * SUB, SUB), lambda i, tc, kc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pblk, 3 * _NQ), lambda i, tc, kc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_ROWS, CPB * SCHUNK), lambda i, tc, kc: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CPB, 8, P), lambda i, tc, kc: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_stream_fwd_kernel, nx, tilesize, T_total, sub),
        out_shape=jax.ShapeDtypeStruct((nbc, 8, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(tile_of_chunk, k_of_chunk, _tri3(), _pix_basis3(tilesize, pblk, sub), attrsT)


def _stream_bwd_impl(attrsT, tile_of_chunk, k_of_chunk, out_chunks, gchunks, totchunks, nx, t_total, tilesize, sub=None):
    R, Lpad = attrsT.shape
    nbc = Lpad // SCHUNK
    grid = Lpad // (CPB * SCHUNK)
    P = tilesize * tilesize
    T_total = t_total  # global; see _stream_fwd_impl
    pblk = sub * sub if sub is not None else min(P, PBLK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3 * SUB, SUB), lambda i, tc, kc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pblk, 3 * _NQ), lambda i, tc, kc: (0, 0), memory_space=pltpu.VMEM),
            # [pb; pb] basis for the mt matmul (see _pix_basis_mt)
            pl.BlockSpec((2 * pblk, _NQ), lambda i, tc, kc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_ROWS, CPB * SCHUNK), lambda i, tc, kc: (0, i), memory_space=pltpu.VMEM),
            # forward's per-chunk saved state, and ONE chunk of the same
            # array — the previous block's LAST chunk (the j==0 chunk's entry
            # state; block 0 clamps — its first chunk is always a segment
            # head and never reads it). A (1, 8, P) block: reading the whole
            # previous (CPB, 8, P) block for one row cost 64 MB/step of
            # extra HBM reads at 1080p.
            pl.BlockSpec((CPB, 8, P), lambda i, tc, kc: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P), lambda i, tc, kc: (jnp.maximum(i * CPB - 1, 0), 0, 0), memory_space=pltpu.VMEM),
            # cotangents: 5 rows only (r, g, b, d, logT) — rows 5-7 of the
            # fwd out layout are kernel bookkeeping with zero cotangent
            pl.BlockSpec((CPB, G_ROWS, P), lambda i, tc, kc: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CPB, 1, P), lambda i, tc, kc: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NUM_ROWS, CPB * SCHUNK), lambda i, tc, kc: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_stream_bwd_kernel, nx, tilesize, T_total, grid, sub),
        out_shape=jax.ShapeDtypeStruct((NUM_ROWS, Lpad), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(tile_of_chunk, k_of_chunk, _tri3(), _pix_basis3(tilesize, pblk, sub),
      _pix_basis_mt(tilesize, pblk, sub),
      attrsT, out_chunks, out_chunks, gchunks, totchunks)


def _chunk_tiles_global(bins, nx, ny, ny_total):
    """Per-chunk tile ids in the GLOBAL id space of an ny_total-row grid:
    local ids shift by row_offset * nx, sentinel ids (>= local T) map to the
    global sentinel nx * ny_total. Identity when the grid is unsharded."""
    if ny_total is None:
        return bins.tile_of_chunk, nx * ny
    T_local = nx * ny
    T_glob = nx * ny_total
    return (
        jnp.where(
            bins.tile_of_chunk >= T_local,
            jnp.int32(T_glob),
            bins.tile_of_chunk + bins.row_offset * nx,
        ),
        T_glob,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def stream_gather_composite(attrs, bins, nx, ny, tilesize, sub=None, ny_total=None):
    """Stream-kernel compositing of the full tile grid: returns [T, 5, P]
    (rows OUT_R..OUT_D premultiplied rgb+depth, OUT_LOGT the final log
    transmittance), with a scatter-free custom VJP routing entry gradients
    back to per-Gaussian attribute rows. `sub` (the semantic tile, e.g. 16)
    activates the per-pixel semantic-rect replay when tilesize is a coarser
    processing tile. `ny_total` (tile-row sharding): the bins cover only ny
    LOCAL grid rows starting at bins.row_offset of an ny_total-row global
    grid — tile origins are computed in global coordinates so per-tile
    output is bitwise-equal to the unsharded grid's."""
    out, _ = _stream_gather_fwd(attrs, bins, nx, ny, tilesize, sub, ny_total)
    return out


def _stream_gather_fwd(attrs, bins, nx, ny, tilesize, sub=None, ny_total=None):
    attrsT = _aligned_attrsT(attrs, bins)  # [R, L_pad]
    tc_glob, t_glob = _chunk_tiles_global(bins, nx, ny, ny_total)
    out_chunks = _stream_fwd_impl(
        attrsT, tc_glob, bins.k_of_chunk, nx, t_glob, tilesize, sub
    )  # [nbc, 8, P]
    T_full = nx * ny
    nbc = out_chunks.shape[0]
    # a tile's final state sits in its LAST chunk's slot; empty tiles (no
    # chunks) take the zero state (acc 0, logT 0 -> T = 1). Only the 5 rows
    # the image needs (r, g, b, d, logT) are gathered — rows 5-7 are kernel
    # bookkeeping the backward re-reads from out_chunks itself.
    last_chunk = bins.aligned_starts[1 : T_full + 1] // SCHUNK - 1
    out = out_chunks[:, 0:G_ROWS][jnp.clip(last_chunk, 0, nbc - 1)]
    # NaN-safe select (not multiply): an empty tile's gathered slot can land
    # in a skipped fully-sentinel block whose HBM is uninitialized garbage
    out = jnp.where((bins.counts > 0)[:, None, None], out, 0.0)
    return out, (attrsT, bins, out, out_chunks, attrs.shape[0])


SORT_ROUTE_MIN_L = 1 << 20  # entry budget above which the backward's
# entry->Gaussian routing sorts instead of gathers: the [L]-row permutation
# gather is HBM-span-bound (~23 ns/row at dense 4K = 45 ms), while a
# (key, 10 payload) lax.sort is 8 ms at the same shape — but at 1080p scale
# the real (semi-local) gather is ~1 ms and beats the sort's fixed passes.


def _zero_dbins(bins):
    from jax.dtypes import float0

    return jax.tree_util.tree_map(lambda x: np.zeros(x.shape, float0), bins)


SEG_B = 1024  # sorted entries per segment-sum grid step
SEG_W = SEG_B + 192  # output window KEYS per step: covers the <= SEG_B
# distinct keys of a block plus the 8-key round-down of the window start
# and slack; multiple of 64 so the packed window is whole (1, 128) tiles


def _segsum_kernel(n_sent, fk8_ref, keys_ref, vals_ref, zeros_ref, out_ref,
                   acc_ref, head_ref, sem_in, sem_out):
    """One grid step of the windowed segment-sum over a PACKED output: row
    r2 of the [n_pad8, 128] output holds keys 8*r2 .. 8*r2+7, 16 gradient
    columns each (lane group g = key % 8) — whole (1, 128) lane tiles, the
    only HBM window shape Mosaic slices cleanly. The 16 gradient rows of
    SEG_B key-sorted entries reduce to per-key sums via 8 one-hot MXU
    matmuls (one per lane group, sharing one row-match mask) written to
    packed rows [fk8/8, fk8/8 + SEG_W/8).

    Cross-block state rides the OUTPUT ITSELF: the window's first packed
    HBM row is read back and accumulated before the write. It holds (a)
    the open run's partial sum from the previous block (the open key is in
    [fk8, fk8 + 8) by the round-down), and (b) the final sums of
    already-closed keys the round-down pulls into this window — both must
    be preserved, and rows no previous block touched are zero (pre-zeroed
    aliased output), so the unconditional add is exact. The sequential
    grid + per-step dma.wait() order the read after the previous write."""
    fk = fk8_ref[pl.program_id(0)]
    pr0 = fk // 8  # packed-row window start
    rd = pltpu.make_async_copy(out_ref.at[pl.ds(pr0, 1)], head_ref, sem_in)
    rd.start()
    keys = keys_ref[...]  # [1, SEG_B] int32, non-decreasing
    # sentinel rows (pad slots, incl. uninitialized rows from skipped
    # fully-sentinel stream blocks) must be ZEROED, not just ignored: the
    # one-hot matmul multiplies every value row by 0 in other keys' columns
    # and 0 * NaN would poison every sum in the block
    sent = keys == n_sent  # [1, B]
    vals = jnp.where(sent, 0.0, vals_ref[...])  # [16, B]
    # sentinel keys remap to window row 0 (their rows are zero, so the sum
    # they join is unchanged) — the window invariant then only concerns
    # REAL keys, keeping the real->sentinel transition block on the fast
    # path (its raw span n_sent - fk8 would always blow the window)
    rel = jnp.where(sent, 0, keys - fk)  # [1, B], in [0, SEG_W) by invariant
    rq = rel >> 3  # packed row per entry
    rm = rel & 7  # lane group per entry
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (SEG_W // 8, 1), 0)
    rowm = (iota_q == rq).astype(jnp.float32)  # [W/8, B] shared row match
    # FULL-f32 via the contraction concat (one-hot entries are exactly 0/1
    # in bf16 and the _split3 terms are bf16-exact, so every product is
    # exact and accumulation is f32; Mosaic's DEFAULT single-pass bf16
    # measured 1.5e-2 rel deviation vs the cumsum fallback, and the 2-term
    # hi/lo split still deviated 2.6e-3 on real-TPU gradients — lo = x -
    # bf16(x) keeps up to 16 mantissa bits, which does NOT fit bf16)
    if KERNEL_FAST:
        vals_cat = vals

        def oh_cat(g):
            return rowm * (rm == g).astype(jnp.float32)
    else:
        vh, vm, vl = _split3(vals)
        vals_cat = jnp.concatenate([vh, vm, vl], axis=1)  # [16, 3B]

        def oh_cat(g):
            oh_g = rowm * (rm == g).astype(jnp.float32)
            return jnp.concatenate([oh_g, oh_g, oh_g], axis=1)  # [W/8, 3B]
    acc = jnp.concatenate(
        [
            _dotf(
                oh_cat(g), vals_cat, (((1,), (1,)), ((), ()))
            )  # [W/8, 16]
            for g in range(8)
        ],
        axis=1,
    )  # [W/8, 128]
    rd.wait()
    acc_ref[...] = jnp.concatenate(
        [acc[0:1] + head_ref[...], acc[1:]], axis=0
    )
    wr = pltpu.make_async_copy(
        acc_ref, out_ref.at[pl.ds(pr0, SEG_W // 8)], sem_out
    )
    wr.start()
    wr.wait()


def _segsum_sorted_mxu(keys2d, fk8, valsT16, n):
    """Per-key sums of key-sorted gradient rows: [16, L_pad] valsT16 (+ the
    [nb, SEG_B] reshaped sorted keys) -> [n_pad, 16] with row g holding the
    sum of rows whose key == g (zero for absent keys). Caller guarantees
    every block's key span fits its SEG_W window (checked in
    _route_by_sort; lax.cond falls back to the cumsum route otherwise)."""
    nb = keys2d.shape[0]
    # packed output: row r2 <-> keys [8 r2, 8 r2 + 8), 16 lanes per key
    n_pad8 = (n + 1 + 7) // 8 + SEG_W // 8
    zeros = jnp.zeros((n_pad8, 128), jnp.float32)
    # keys ride as [1, L_pad]: a (1, SEG_B) block is legal only when the
    # second-minor block dim EQUALS the array dim (Mosaic's divisible-by-8
    # rule exempts exact matches); [nb, SEG_B] with (1, SEG_B) blocks is
    # rejected by the compiled lowering
    keys_row = keys2d.reshape(1, nb * SEG_B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, SEG_B), lambda b, fk: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, SEG_B), lambda b, fk: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # pre-zeroed out alias
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((SEG_W // 8, 128), jnp.float32),
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out2 = pl.pallas_call(
        functools.partial(_segsum_kernel, n),
        out_shape=jax.ShapeDtypeStruct((n_pad8, 128), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},
        interpret=_use_interpret(),
    )(fk8, keys_row, valsT16, zeros)
    return out2.reshape(n_pad8 * 8, 16)  # pure row-major view


def _route_by_sort(dT, bins, n_attr, R_USED):
    """Entry->Gaussian gradient reduction via ONE (key, payloads) sort.

    Sort the per-entry gradient rows by ORIGINAL Gaussian index (the
    existing orig_idx_aligned array; pad/sentinel slots carry key N and
    land — together with any uninitialized rows from skipped sentinel
    blocks — in a suffix run that is never read). Each Gaussian then owns a
    contiguous run and per-Gaussian sums come from the windowed one-hot MXU
    segment-sum kernel (_segsum_sorted_mxu), directly in original-index
    order. Fallback (lax.cond) when some block's key span exceeds the
    kernel's SEG_W window (keys jump over > SEG_W - SEG_B absent Gaussians
    within one block — only plausible in sparse scenes far below the
    SORT_ROUTE_MIN_L gate): cumsum + shifted boundary-row differences, the
    pre-kernel route (a [L_pad, 10] row gather measured 9.1 ms at dense 4K
    vs ~2-3 ms for the kernel). The row-major dT feeds the sort as 10
    contiguous [L_pad] column views — no entry-major transpose."""
    from scgaussian_tpu.renderer.binning import _tile_starts

    n = n_attr - 1  # attrs carries the +1 sentinel row
    L_pad = dT.shape[1]
    keys = jax.lax.optimization_barrier(bins.orig_idx_aligned)
    routed = jax.lax.sort(
        (keys,) + tuple(dT[i] for i in range(R_USED)), num_keys=1
    )
    keys_s = routed[0]
    nb = L_pad // SEG_B
    keys2d = keys_s.reshape(nb, SEG_B)
    fk8 = (keys2d[:, 0] // 8) * 8  # [nb] window starts (8-row aligned)
    # window invariant over REAL keys only (the kernel remaps sentinel keys
    # to row 0): a block with no real keys checks -1 - fk8 < 0 < SEG_W
    lk_real = jnp.max(jnp.where(keys2d == n, -1, keys2d), axis=1)
    window_ok = jnp.all(lk_real - fk8 < SEG_W)

    def fast(_):
        zrow = jnp.zeros_like(routed[1])
        valsT16 = jnp.stack(
            list(routed[1:]) + [zrow] * (16 - R_USED), axis=0
        )  # [16, L_pad] row-major (contiguous concat of the sort outputs)
        out = _segsum_sorted_mxu(keys2d, fk8, valsT16, n)
        return out[:n, :R_USED]

    def slow(_):
        starts_g = _tile_starts(keys_s, n)  # [N + 1] run boundaries
        d_sorted = jnp.stack(routed[1:], axis=1)  # [L_pad, R_USED]
        csum = jax.lax.optimization_barrier(jnp.cumsum(d_sorted, axis=0))
        seg_last = starts_g[1:] - 1  # [N] inclusive run end
        # NaN-safe select: with zero real entries the clipped gather can
        # read a garbage row from a skipped sentinel block
        end_vals = jnp.where(
            (seg_last >= 0)[:, None], csum[jnp.clip(seg_last, 0, L_pad - 1)], 0.0
        )
        start_prev = jnp.concatenate(
            [jnp.zeros((1, R_USED), end_vals.dtype), end_vals[:-1]], axis=0
        )
        return end_vals - start_prev  # [N, R_USED] original-index order

    d_attrs = jax.lax.cond(window_ok, fast, slow, None)
    d_attrs = jnp.concatenate(
        [d_attrs, jnp.zeros((n, NUM_ROWS - R_USED), d_attrs.dtype)], axis=1
    )
    return jnp.concatenate(
        [d_attrs, jnp.zeros((1, NUM_ROWS), d_attrs.dtype)], axis=0
    )


def _stream_gather_bwd(nx, ny, tilesize, sub, ny_total, res, gout):
    attrsT, bins, fout, out_chunks, n_attr = res
    L = bins.orig_idx_sorted.shape[0]
    R_USED = ROW_D + 1
    nbc = attrsT.shape[1] // SCHUNK
    T_full = nx * ny
    tile_c = jnp.clip(bins.tile_of_chunk[:nbc], 0, T_full - 1)  # LOCAL ids
    # chunk-gather the per-tile cotangents and gww totals so the kernel
    # reads them on the same auto-pipeline as the attribute stream ([T]-row
    # gathers of 8 KB rows); barriers keep the gathers unfused from their
    # producer chains (fused gathers serialize)
    tot_tile = jnp.sum(gout[:, 0:4, :] * fout[:, 0:4, :], axis=1, keepdims=True)
    tile_c, gout, tot_tile = jax.lax.optimization_barrier((tile_c, gout, tot_tile))
    gchunks = gout[tile_c]  # gout is already [T, G_ROWS, P]
    totchunks = tot_tile[tile_c]
    tc_glob, t_glob = _chunk_tiles_global(bins, nx, ny, ny_total)
    dT = _stream_bwd_impl(
        attrsT, tc_glob, bins.k_of_chunk, out_chunks,
        gchunks, totchunks, nx, t_glob, tilesize, sub,
    )  # [NUM_ROWS, L_pad] row-major (the kernel's row-space store)
    if L >= SORT_ROUTE_MIN_L:
        return _route_by_sort(dT, bins, n_attr, R_USED), _zero_dbins(bins)
    # ONE XLA transpose to entry-major for the routing gather (replaces
    # 8192 in-kernel [8, C] transposes); barrier keeps the transpose and the
    # gather as separate vectorized ops (fused they serialize). The gather
    # is byte-identical to the cull-free form — CULLED presort slots point
    # at aligned slot 0 (binning sanitizes the index) and read a real row,
    # which an [N]-scale count*row0 correction subtracts after the segment
    # sums; any shape change or fused select here flips the gather source
    # to a ~2x slower row-major layout (measured, see binning).
    d_aligned = jax.lax.optimization_barrier(dT[:R_USED].T)
    d_presort = d_aligned[bins.aligned_pos_of_presort]
    e = jnp.arange(L, dtype=jnp.int32)
    real = e < bins.total_entries
    # NaN-safe select (not multiply): invalid presort slots clip into
    # skipped fully-sentinel blocks whose dblk rows are uninitialized
    d_presort = jnp.where(real[:, None], d_presort, 0.0)
    # culled-entry counter rides the cumsum as an 11th column (a SEPARATE
    # 1-column cumsum + boundary gather measured 1.2 ms EXTRA at 1080p
    # without speeding the main gather back up — don't split it)
    culled_col = (real & ~bins.presort_valid).astype(d_presort.dtype)
    d_ext = jnp.concatenate([d_presort, culled_col[:, None]], axis=1)
    csum = jax.lax.optimization_barrier(jnp.cumsum(d_ext, axis=0))
    # ONE boundary gather instead of two: segments are contiguous in depth
    # rank, so the previous segment's end value is just the SHIFTED end-value
    # row (empty segments read their predecessor's end and difference to 0)
    seg_last = bins.seg_offsets + bins.seg_counts - 1  # [N] inclusive end
    end_vals = csum[jnp.clip(seg_last, 0, L - 1)] * (seg_last >= 0)[:, None]
    start_prev = jnp.concatenate(
        [jnp.zeros((1, end_vals.shape[1]), end_vals.dtype), end_vals[:-1]], axis=0
    )
    sums_ext = end_vals - start_prev  # [N, R_USED + 1]
    # subtract the slot-0 row once per culled entry; if nothing was kept at
    # all, slot 0 is an uninitialized skipped block — select, don't multiply.
    # Read slot 0 from dT (16 strided scalar loads), NOT d_aligned: a second
    # consumer of d_aligned lets XLA layout assignment flip the routing
    # gather's source layout.
    d0 = jnp.where(
        bins.aligned_starts[-1] > 0, dT[:R_USED, 0], jnp.zeros((R_USED,), dT.dtype)
    )
    ccnt = sums_ext[:, R_USED:]
    sums_rank = sums_ext[:, :R_USED] - jnp.where(ccnt > 0, ccnt * d0[None, :], 0.0)
    d_attrs = jax.lax.optimization_barrier(sums_rank)[bins.inv_order]
    d_attrs = jnp.concatenate(
        [d_attrs, jnp.zeros((d_attrs.shape[0], NUM_ROWS - R_USED), d_attrs.dtype)],
        axis=1,
    )
    d_attrs = jnp.concatenate(
        [d_attrs, jnp.zeros((n_attr - d_attrs.shape[0], NUM_ROWS), d_attrs.dtype)],
        axis=0,
    )
    return d_attrs, _zero_dbins(bins)


stream_gather_composite.defvjp(_stream_gather_fwd, _stream_gather_bwd)
