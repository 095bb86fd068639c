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
(w @ attrs). Chunks of 128 splats are pipelined per tile; a scalar-prefetched
per-tile count bounds the chunk loop so empty tiles cost nothing.

Layouts: per-tile splat data is [T, 12, K] (attribute rows, splat lanes);
all in-kernel compute is [P=tile^2 (sublanes), C=128 (lanes)] so no
transposes are needed in either direction.

The backward pass (CUDA-convention gradients, see `_bwd_kernel`) recomputes
the forward quantities in two chunk passes (total-then-grads) instead of
storing per-splat state — the same recompute-transmittance trick as the CUDA
backward, but with suffix sums expressed as `total - prefix`.
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


def _pix_coords(tile_id, nx: int, tilesize: int, P: int):
    base_x = (tile_id % nx) * tilesize
    base_y = (tile_id // nx) * tilesize
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pixx = (base_x + p % tilesize).astype(jnp.float32)
    pixy = (base_y + p // tilesize).astype(jnp.float32)
    return pixx, pixy


def _chunk_geometry(data_ref, sl, pixx, pixy):
    """Shared per-chunk alpha computation; slices the [1, NUM_ROWS, K] ref."""
    mx = data_ref[0, ROW_MX : ROW_MX + 1, sl]  # [1, C]
    my = data_ref[0, ROW_MY : ROW_MY + 1, sl]
    ca = data_ref[0, ROW_CA : ROW_CA + 1, sl]
    cb = data_ref[0, ROW_CB : ROW_CB + 1, sl]
    cc = data_ref[0, ROW_CC : ROW_CC + 1, sl]
    op = data_ref[0, ROW_OP : ROW_OP + 1, sl]
    dx = mx - pixx  # [P, C]
    dy = my - pixy
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    alpha_raw = op * G
    alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
    # float 0/1 masks throughout: i1 vectors in loop carries fail to legalize
    # in Mosaic (scf.for legalization error on the tunneled toolchain)
    live = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), 1.0, 0.0)
    alpha = alpha * live
    return dx, dy, ca, cb, cc, op, G, alpha, live


def _fwd_kernel(nx: int, tilesize: int, counts_ref, tids_ref, tri_ref, data_ref, out_ref):
    P = tilesize * tilesize
    t = pl.program_id(0)
    cnt = counts_ref[t]
    # global tile id (differs from t under tile sharding)
    pixx, pixy = _pix_coords(tids_ref[t], nx, tilesize, P)
    nchunks = pl.cdiv(cnt, CHUNK)

    def body(k, carry):
        logT, done, acc = carry
        sl = pl.ds(pl.multiple_of(k * CHUNK, CHUNK), CHUNK)
        *_, alpha, live = _chunk_geometry(data_ref, sl, pixx, pixy)
        l = jnp.log1p(-alpha)  # [P, C]
        S = jnp.dot(l, tri_ref[:], preferred_element_type=jnp.float32)
        logT_after = logT + S
        # Sticky CUDA early-stop: within the chunk, carry+S is non-increasing
        # so the per-column test reproduces "first crossing excludes the rest";
        # `done` (float 0/1) propagates the crossing across chunk boundaries.
        inc = jnp.where(logT_after >= LOG_T_EPS, 1.0, 0.0) * (1.0 - done)
        T_before = jnp.exp(logT_after - l)
        w = alpha * T_before * inc
        attrs = data_ref[0, ROW_R : ROW_D + 1, sl]  # [4, C] rgb + depth
        acc = acc + jax.lax.dot_general(
            w, attrs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logT = logT + jnp.sum(l * inc, axis=1, keepdims=True)
        done = jnp.maximum(
            done, jnp.where(logT_after[:, CHUNK - 1 :] < LOG_T_EPS, 1.0, 0.0)
        )
        return logT, done, acc

    logT0 = jnp.zeros((P, 1), jnp.float32)
    done0 = jnp.zeros((P, 1), jnp.float32)
    acc0 = jnp.zeros((P, 4), jnp.float32)
    logT, _, acc = jax.lax.fori_loop(0, nchunks, body, (logT0, done0, acc0))
    out = jnp.concatenate(
        [acc, logT, jnp.zeros((P, 3), jnp.float32)], axis=1
    )  # [P, 8]
    out_ref[0] = out


def _bwd_kernel(nx: int, tilesize: int, counts_ref, tids_ref, tri_ref, data_ref, gout_ref, ddata_ref):
    P = tilesize * tilesize
    t = pl.program_id(0)
    cnt = counts_ref[t]
    pixx, pixy = _pix_coords(tids_ref[t], nx, tilesize, P)
    g_attrs = gout_ref[0, :, 0:4]  # cotangents for premultiplied rgb + depth
    g_logT = gout_ref[0, :, 4:5]
    nchunks = pl.cdiv(cnt, CHUNK)

    ddata_ref[0, :, :] = jnp.zeros(ddata_ref.shape[1:], jnp.float32)

    def common(k, logT, done):
        sl = pl.ds(pl.multiple_of(k * CHUNK, CHUNK), CHUNK)
        dx, dy, ca, cb, cc, op, G, alpha, live = _chunk_geometry(data_ref, sl, pixx, pixy)
        l = jnp.log1p(-alpha)
        S = jnp.dot(l, tri_ref[:], preferred_element_type=jnp.float32)
        logT_after = logT + S
        inc = jnp.where(logT_after >= LOG_T_EPS, 1.0, 0.0) * (1.0 - done)
        T_before = jnp.exp(logT_after - l)
        w = alpha * T_before * inc
        attrs = data_ref[0, ROW_R : ROW_D + 1, sl]
        # g_w[p, c] = sum_ch g_attrs[p, ch] * attrs[ch, c]
        g_w = jnp.dot(g_attrs, attrs, preferred_element_type=jnp.float32)
        logT_next = logT + jnp.sum(l * inc, axis=1, keepdims=True)
        done_next = jnp.maximum(
            done, jnp.where(logT_after[:, CHUNK - 1 :] < LOG_T_EPS, 1.0, 0.0)
        )
        return (
            sl, dx, dy, ca, cb, cc, op, G, alpha, live, inc, T_before, w, g_w,
            logT_next, done_next,
        )

    # Pass 1: total per-pixel sum of g_w * w (for suffix sums A_i = total - prefix_i).
    def body1(k, carry):
        logT, done, total = carry
        *_, w, g_w, logT_next, done_next = common(k, logT, done)
        total = total + jnp.sum(g_w * w, axis=1, keepdims=True)
        return logT_next, done_next, total

    logT0 = jnp.zeros((P, 1), jnp.float32)
    done0 = jnp.zeros((P, 1), jnp.float32)
    _, _, total = jax.lax.fori_loop(
        0, nchunks, body1, (logT0, done0, jnp.zeros((P, 1), jnp.float32))
    )

    # Pass 2: per-splat gradients.
    def body2(k, carry):
        logT, done, prefix = carry
        (sl, dx, dy, ca, cb, cc, op, G, alpha, live, inc, T_before, w, g_w,
         logT_next, done_next) = common(k, logT, done)
        gww = g_w * w  # [P, C]
        prefix_inc = prefix + jnp.dot(gww, tri_ref[:], preferred_element_type=jnp.float32)
        A = total - prefix_inc  # suffix sum over j > i of g_w_j w_j
        one_m = 1.0 - alpha
        d_alpha = (g_w * T_before - (A + g_logT) / one_m) * inc * live
        # CUDA-convention: the 0.99 cap is ignored in the backward pass
        # (backward.cu uses dL_dG = opacity * dL_dalpha, dL_dopacity = G * dL_dalpha).
        d_op = G * d_alpha
        d_power = op * d_alpha * G
        d_ca = d_power * (-0.5 * dx * dx)
        d_cb = d_power * (-dx * dy)
        d_cc = d_power * (-0.5 * dy * dy)
        d_mx = d_power * (-(ca * dx + cb * dy))
        d_my = d_power * (-(cc * dy + cb * dx))
        # attr grads: d_attrs[ch, c] = sum_p g_attrs[p, ch] * w[p, c]
        d_attrs = jax.lax.dot_general(
            g_attrs, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [4, C]

        def rowsum(x):
            return jnp.sum(x, axis=0, keepdims=True)  # [1, C]

        ddata_ref[0, ROW_MX : ROW_MX + 1, sl] = rowsum(d_mx)
        ddata_ref[0, ROW_MY : ROW_MY + 1, sl] = rowsum(d_my)
        ddata_ref[0, ROW_CA : ROW_CA + 1, sl] = rowsum(d_ca)
        ddata_ref[0, ROW_CB : ROW_CB + 1, sl] = rowsum(d_cb)
        ddata_ref[0, ROW_CC : ROW_CC + 1, sl] = rowsum(d_cc)
        ddata_ref[0, ROW_R : ROW_D + 1, sl] = d_attrs
        ddata_ref[0, ROW_OP : ROW_OP + 1, sl] = rowsum(d_op)
        prefix = prefix + jnp.sum(gww, axis=1, keepdims=True)
        return logT_next, done_next, prefix

    jax.lax.fori_loop(0, nchunks, body2, (logT0, done0, jnp.zeros((P, 1), jnp.float32)))


def _tri_matrix(size: int = CHUNK) -> jnp.ndarray:
    """Upper-triangular (inclusive) ones: TRI[j, i] = 1 if j <= i, so that
    (L @ TRI)[p, i] = inclusive prefix sum of L along lanes."""
    j = np.arange(size)
    return jnp.asarray((j[:, None] <= j[None, :]).astype(np.float32))


def _use_interpret() -> bool:
    # Compiled Mosaic on real TPU platforms (incl. the tunneled "axon"
    # platform); interpret mode only on CPU (unit tests).
    return jax.default_backend() == "cpu"


def _composite_fwd_impl(tile_data, counts, nx, ny, tilesize, tile_ids=None):
    T, _, K = tile_data.shape
    P = tilesize * tilesize
    if tile_ids is None:
        tile_ids = jnp.arange(T, dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((CHUNK, CHUNK), lambda i, c, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUM_ROWS, K), lambda i, c, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, 8), lambda i, c, t: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nx, tilesize),
        out_shape=jax.ShapeDtypeStruct((T, P, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts, tile_ids, _tri_matrix(), tile_data)


def _composite_bwd_impl(tile_data, counts, gout, nx, ny, tilesize, tile_ids=None):
    T, _, K = tile_data.shape
    P = tilesize * tilesize
    if tile_ids is None:
        tile_ids = jnp.arange(T, dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((CHUNK, CHUNK), lambda i, c, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NUM_ROWS, K), lambda i, c, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 8), lambda i, c, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NUM_ROWS, K), lambda i, c, t: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    ddata = pl.pallas_call(
        functools.partial(_bwd_kernel, nx, tilesize),
        out_shape=jax.ShapeDtypeStruct((T, NUM_ROWS, K), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts, tile_ids, _tri_matrix(), tile_data, gout)
    return ddata


# --------------------------------------------------------------------------
# gather + composite with a scatter-free custom VJP
#
# Forward: ONE [L]-row gather (attrs by sorted entry -> sorted_attrs) plus a
# contiguous-range gather (per-tile [start, start+K) slices -> tile_data),
# then the Pallas kernel. Backward: the kernel's per-entry grads are routed
# back to per-Gaussian grads without any duplicate-index scatter-add:
#   entry grads -> (gather) tile-sorted order -> (unique-index permutation
#   scatter) gaussian-major order -> cumsum + segment-difference -> grads per
#   depth rank -> (gather by inv_order) grads per Gaussian.
# Scatter-adds with duplicate indices are pathologically slow on TPU; the
# only scatter left is a permutation (unique indices), and the reduction
# over each Gaussian's covered tiles is a cumsum difference over its
# CONTIGUOUS gaussian-major segment (binning emits entries gaussian-major).
# --------------------------------------------------------------------------


def _build_tile_data(attrs, bins, num_tiles, K):
    L = bins.orig_idx_sorted.shape[0]
    sorted_attrs = attrs[bins.orig_idx_sorted]  # [L, R]
    k = jnp.arange(K, dtype=jnp.int32)
    dest = bins.starts[:num_tiles, None] + k[None, :]  # [T, K]
    valid_k = k[None, :] < jnp.minimum(bins.counts, K)[:, None]
    rows = sorted_attrs[jnp.clip(dest, 0, L - 1)]  # [T, K, R]
    rows = rows * valid_k[..., None]
    return rows.transpose(0, 2, 1), valid_k  # [T, R, K]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def gather_composite(attrs, bins, nx, ny, tilesize, K):
    tile_data, _ = _build_tile_data(attrs, bins, nx * ny, K)
    counts = jnp.minimum(bins.counts, K)
    return _composite_fwd_impl(tile_data, counts, nx, ny, tilesize)


def _gather_composite_fwd(attrs, bins, nx, ny, tilesize, K):
    tile_data, valid_k = _build_tile_data(attrs, bins, nx * ny, K)
    counts = jnp.minimum(bins.counts, K)
    out = _composite_fwd_impl(tile_data, counts, nx, ny, tilesize)
    return out, (tile_data, counts, valid_k, bins, attrs.shape[0])


def _gather_composite_bwd(nx, ny, tilesize, K, res, gout):
    tile_data, counts, valid_k, bins, n_attr = res
    T = nx * ny
    L = bins.orig_idx_sorted.shape[0]
    R = NUM_ROWS

    ddata = _composite_bwd_impl(tile_data, counts, gout, nx, ny, tilesize)
    d_rows = ddata.transpose(0, 2, 1) * valid_k[..., None]  # [T, K, R]
    d_rows = d_rows.reshape(T * K, R)

    # sorted entry e -> flat (t, k) slot in d_rows. (scatter-ones + cumsum
    # instead of searchsorted: binary search = log2(L) serialized 1D gathers,
    # ~1ms each on TPU.)
    e = jnp.arange(L, dtype=jnp.int32)
    marks = jnp.zeros((L,), jnp.int32).at[bins.starts].add(1, mode="drop")
    t = jnp.cumsum(marks) - 1  # == searchsorted(starts, e, 'right') - 1
    t_ok = (t >= 0) & (t < T)
    t_c = jnp.clip(t, 0, T - 1)
    k = e - bins.starts[t_c]
    k_ok = (k >= 0) & (k < K)
    flat = jnp.clip(t_c * K + k, 0, T * K - 1)
    d_sorted = d_rows[flat] * (t_ok & k_ok)[:, None].astype(d_rows.dtype)  # [L, R]

    # tile-sorted -> gaussian-major via the (unique) presort permutation
    # tile-sorted -> gaussian-major via the precomputed inverse permutation
    # (a gather; row scatters cost ~45 ms at L=800k on TPU)
    d_presort = d_sorted[bins.sorted_pos_of_presort]

    # per-Gaussian reduction over its contiguous segment: cumsum difference
    csum = jnp.cumsum(d_presort, axis=0)  # [L, R]
    seg_end = jnp.clip(bins.seg_offsets + bins.seg_counts - 1, 0, L - 1)
    end_vals = csum[seg_end]  # [N, R]
    start_prev = jnp.where(
        (bins.seg_offsets > 0)[:, None],
        csum[jnp.clip(bins.seg_offsets - 1, 0, L - 1)],
        0.0,
    )
    sums_rank = jnp.where((bins.seg_counts > 0)[:, None], end_vals - start_prev, 0.0)

    d_attrs = sums_rank[bins.inv_order]  # [N, R] back to original order
    d_attrs = jnp.concatenate(
        [d_attrs, jnp.zeros((n_attr - d_attrs.shape[0], R), d_attrs.dtype)], axis=0
    )

    from jax.dtypes import float0

    d_bins = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, float0), bins
    )
    return d_attrs, d_bins


gather_composite.defvjp(_gather_composite_fwd, _gather_composite_bwd)


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
    max_per_tile: int = 1024,
    entry_budget: int | None = None,
    aligned_budget: int | None = None,
    flat: bool = True,
    ptile: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full tile pipeline: bin (XLA) -> gather -> Pallas composite -> assemble.

    Returns (color [3,H,W], depth [1,H,W], alpha [1,H,W], overflow [] int32);
    overflow counts tile entries dropped because they exceeded entry_budget
    (0 == exact CUDA unbudgeted semantics). Gradients flow to all
    differentiable projected attributes through the scatter-free custom VJP
    of gather_composite.

    `tile` is the SEMANTIC tile (CUDA's 16px rect-membership grid); `ptile`
    (stream path only, default == tile) is the coarser PROCESSING tile —
    entries, sorts and gathers run on the ptile grid (~2-3x fewer of them at
    ptile 32) while the kernels replay the semantic rect test per pixel from
    the packed rect rows, keeping the output semantically identical to
    `tile` semantics (within fp noise at the 1/255 alpha threshold).
    """
    from scgaussian_tpu.renderer.binning import bin_gaussians, default_entry_budget

    if ptile is None:
        ptile = tile
    assert flat or ptile == tile, "ptile != tile requires the stream path"
    n = proj.depth.shape[0]
    if entry_budget is None:
        entry_budget = default_entry_budget(n, ptile // tile)
    # the stream (flat=True) path aligns tile segments at SCHUNK granularity;
    # the v2/v1 fallbacks keep CHUNK-aligned windows for their manual DMAs
    bins = bin_gaussians(
        proj, width, height, tile, entry_budget,
        chunk=SCHUNK if flat else CHUNK,
        aligned_budget=aligned_budget,
        ptile=ptile,
    )
    nx = (width + ptile - 1) // ptile
    ny = (height + ptile - 1) // ptile

    sub = tile if ptile != tile else None
    attrs = attrs_matrix(proj, width=width, height=height, sem_tile=sub)

    if flat:
        # [T, 5, P]: exactly the rows the image needs (r, g, b, d, logT)
        out5 = stream_gather_composite(attrs, bins, nx, ny, ptile, sub)
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
        return color_out, acc_d[None], (1.0 - T_fin)[None], bins.overflow

    out = gather_composite(attrs, bins, nx, ny, tile, max_per_tile)
    img = out.reshape(ny, nx, tile, tile, 8).transpose(0, 2, 1, 3, 4)
    img = img.reshape(ny * tile, nx * tile, 8)[:height, :width]
    acc_rgb = img[..., OUT_R : OUT_B + 1]  # [H, W, 3]
    acc_d = img[..., OUT_D]
    T_fin = jnp.exp(img[..., OUT_LOGT])
    color_out = acc_rgb + T_fin[..., None] * bg_color[None, None, :]
    return (
        color_out.transpose(2, 0, 1),
        acc_d[None],
        (1.0 - T_fin)[None],
        bins.overflow,
    )


# --------------------------------------------------------------------------
# v2 "flat" kernels: per-tile entry ranges are DMA'd straight from the
# SEGMENT-ALIGNED [NUM_ROWS, L_pad] attribute array in HBM (binning step 5)
# — no padded [T, K] tile_data is ever materialized. This removes the
# dominant cost at dense resolutions (the [T*K]-row gather + its memory
# traffic: 400 MB at 1080p with K=1024 vs ~60 MB of aligned entries) AND
# the per-tile K cap, restoring exact CUDA semantics for arbitrarily deep
# tiles. Every CHUNK window belongs to exactly one tile, so the kernels
# carry no in-segment masks and the backward's gradient windows are plain
# exclusive double-buffered writes. Input chunks are double-buffered.
# --------------------------------------------------------------------------


def _flat_rows(buf, slot):
    """Row accessors for the [2, NUM_ROWS, CHUNK] VMEM chunk buffer."""

    def row(r):
        return buf[slot, r : r + 1, :]  # [1, C]

    return row


# The Gaussian falloff power = -0.5(ca dx^2 + cc dy^2) - cb dx dy is a
# quadratic polynomial in the pixel coordinate, so the [P, C] evaluation is
# ONE MXU matmul  power = PixBasis[P, 8] @ Coef[8, C]  instead of ~12 VPU
# ops per pixel-splat pair; the backward's per-splat row sums
# rowsum_p(d_power * poly(px, py)) likewise become ONE matmul
# M = PixBasis^T @ d_power plus [1, C] chain rule. Coordinates are
# TILE-LOCAL (px in [0, tile), mx - tile_origin) to bound the fp32
# cancellation of the expansion; the residual noise (~1e-5 in power) is
# guarded by POWER_EPS + clamping G = exp(min(power, 0)) so a splat's
# center pixel (analytically power == 0 for any PD conic) can never be
# dropped by rounding. CUDA evaluates dx directly (forward.cu renderCUDA);
# semantics agree to ~1e-4 relative in alpha.
POWER_EPS = 1e-4
_NQ = 8  # quadratic basis rows [1, px, py, px^2, px*py, py^2, 0, 0]


def _pix_basis(tilesize: int, P: int, sub: int | None = None):
    """[P, _NQ] pixel basis (columns [1, lx, ly, lx^2, lx*ly, ly^2, 0, 0];
    lx/ly are processing-tile-local pixel coordinates).

    With `sub` (semantic sub-tile mode) the PIXEL ORDER is (qy, qx, ly%sub,
    lx%sub): each sub*sub pixel block covers exactly ONE semantic sub-tile,
    so rect membership is a per-(entry, block) row constant the kernels
    fold into the a0 coefficient row (_stream_block_alpha) — no extra basis
    columns or matmul blocks. rasterize's image assembly undoes the
    reordering with the matching reshape/transpose."""
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    if sub is None:
        lxi = p % tilesize
        lyi = p // tilesize
    else:
        nsx = tilesize // sub
        blk = p // (sub * sub)
        ps = p % (sub * sub)
        lxi = (blk % nsx) * sub + ps % sub
        lyi = (blk // nsx) * sub + ps // sub
    lx = lxi.astype(jnp.float32)
    ly = lyi.astype(jnp.float32)
    one = jnp.ones((P, 1), jnp.float32)
    zero = jnp.zeros((P, 1), jnp.float32)
    return jnp.concatenate(
        [one, lx, ly, lx * lx, lx * ly, ly * ly, zero, zero], axis=1
    )  # [P, _NQ]


def _flat_chunk_geometry(buf, slot, bx, by, pixb):
    """Chunk windows are SEGMENT-ALIGNED (each belongs to exactly one tile;
    binning.aligned_starts) so no in-segment masking is needed: pad slots
    gather the zero sentinel attribute row whose opacity 0 fails the
    ALPHA_MIN test. bx/by are the tile origin in pixels; pixb is the
    quadratic pixel basis from _pix_basis."""
    row = _flat_rows(buf, slot)
    mx = row(ROW_MX) - bx  # tile-local [1, C]
    my = row(ROW_MY) - by
    ca, cb, cc = row(ROW_CA), row(ROW_CB), row(ROW_CC)
    op = row(ROW_OP)
    a1 = ca * mx + cb * my
    a2 = cc * my + cb * mx
    a0 = -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my
    zero = jnp.zeros_like(a0)
    coef = jnp.concatenate(
        [a0, a1, a2, -0.5 * ca, -cb, -0.5 * cc, zero, zero], axis=0
    )  # [_NQ, C]
    power = jnp.dot(pixb, coef, preferred_element_type=jnp.float32)  # [P, C]
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, op * G)
    live = jnp.where((power <= POWER_EPS) & (alpha >= ALPHA_MIN), 1.0, 0.0)
    alpha = alpha * live
    # [8, C]: (r, g, b, d, 0, 0, 0, 0) — the zero tail rows make this a
    # direct matmul operand for the [P, 8] output accumulator
    attrs8 = buf[slot, ROW_R : ROW_R + 8, :]
    return mx, my, ca, cb, cc, op, G, alpha, live, attrs8


# Tiles composited per Pallas program (static unroll). The per-program grid
# overhead (output-block DMA orchestration + Mosaic loop prologue) measures
# ~0.7 us on v5e — 5.7 ms across a bare 8160-tile 1080p grid, ~40% of the
# whole forward kernel — so amortizing it over GROUP tiles is the single
# biggest kernel win. Entries of consecutive tiles are contiguous in the
# sorted attribute stream, so grouping costs nothing in DMA locality.
GROUP = 8


def _flat_fwd_kernel(
    nx: int, tilesize: int,
    counts_ref, starts_ref, tids_ref,
    tri_ref, pixb_ref, attrsT_ref,
    out_ref,
    buf, sems,
):
    P = tilesize * tilesize
    i = pl.program_id(0)
    pixb = pixb_ref[:]
    for g in range(GROUP):
        _flat_fwd_tile(
            nx, tilesize, P, i * GROUP + g, g,
            counts_ref, starts_ref, tids_ref, tri_ref, attrsT_ref,
            out_ref, buf, sems, pixb,
        )


def _flat_fwd_tile(
    nx, tilesize, P, t, g,
    counts_ref, starts_ref, tids_ref, tri_ref, attrsT_ref,
    out_ref, buf, sems, pixb,
):
    cnt = counts_ref[t]
    # segment-aligned layout: the tile's windows [start, start + cnt_pad)
    # are CHUNK-multiples and exclusively owned (binning.aligned_starts)
    start = pl.multiple_of(starts_ref[t], CHUNK)
    tid = tids_ref[t]
    bx = ((tid % nx) * tilesize).astype(jnp.float32)
    by = ((tid // nx) * tilesize).astype(jnp.float32)
    nchunks = pl.cdiv(cnt, CHUNK)

    def in_dma(k, slot):
        return pltpu.make_async_copy(
            attrsT_ref.at[:, pl.ds(start + k * CHUNK, CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        in_dma(0, 0).start()

    def body(k, carry):
        logT, done, acc, lastp = carry
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nchunks)
        def _():
            in_dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        in_dma(k, slot).wait()
        *_, alpha, live, attrs8 = _flat_chunk_geometry(buf, slot, bx, by, pixb)
        l = jnp.log1p(-alpha)
        S = jnp.dot(l, tri_ref[:], preferred_element_type=jnp.float32)
        logT_after = logT + S
        inc = jnp.where(logT_after >= LOG_T_EPS, 1.0, 0.0) * (1.0 - done)
        T_before = jnp.exp(logT_after - l)
        w = alpha * T_before * inc
        # acc is the [P, 8] OUTPUT-layout accumulator: attrs8's zero tail
        # rows keep cols 4-7 at zero until logT/lastp are stored below
        acc = acc + jax.lax.dot_general(
            w, attrs8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logT = logT + jnp.sum(l * inc, axis=1, keepdims=True)
        done = jnp.maximum(
            done, jnp.where(logT_after[:, CHUNK - 1 :] < LOG_T_EPS, 1.0, 0.0)
        )
        # per-pixel 1-based position (within the tile segment) of the last
        # contributing splat — consumed by the single-pass reverse backward
        pos1 = (
            k * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + 1
        ).astype(jnp.float32)
        lastp = jnp.maximum(
            lastp,
            jnp.max(pos1 * jnp.where(alpha > 0.0, inc, 0.0), axis=1, keepdims=True),
        )
        return logT, done, acc, lastp

    logT0 = jnp.zeros((P, 1), jnp.float32)
    done0 = jnp.zeros((P, 1), jnp.float32)
    acc0 = jnp.zeros((P, 8), jnp.float32)
    lastp0 = jnp.zeros((P, 1), jnp.float32)
    logT, _, acc, lastp = jax.lax.fori_loop(0, nchunks, body, (logT0, done0, acc0, lastp0))
    out_ref[g] = acc
    out_ref[g, :, OUT_LOGT : OUT_LOGT + 1] = logT
    out_ref[g, :, OUT_LASTP : OUT_LASTP + 1] = lastp


def _flat_bwd_kernel(
    nx: int, tilesize: int,
    counts_ref, starts_ref, tids_ref,
    tri_ref, pixb_ref, attrsT_ref, gout_ref, fout_ref, dzero_ref,
    dT_ref,
    buf, dbuf, accbuf, sems, wsems,
):
    """Single-pass REVERSE backward (the CUDA back-to-front trick, log-form):

    walking chunks back to front with the forward's saved final
    transmittance and per-pixel last-contributor position, the per-splat
    transmittance-before is reconstructed as
        logT_before_i = logT_fin - sum_{j >= i, included} l_j
    and the suffix sums A_i = sum_{j > i} g_w_j w_j accumulate naturally in
    the walk — one DMA sweep and ~half the recompute of the two-forward-pass
    formulation. Inclusion needs no transmittance test at all:
    included == live AND position < last_contributor (inclusion is a prefix
    under the sticky early-stop)."""
    del dzero_ref  # aliased to dT_ref; provides the zero initialization
    P = tilesize * tilesize
    i = pl.program_id(0)
    pixb = pixb_ref[:]
    for g in range(GROUP):
        _flat_bwd_tile(
            nx, tilesize, P, i * GROUP + g, g,
            counts_ref, starts_ref, tids_ref, tri_ref, attrsT_ref,
            gout_ref, fout_ref, dT_ref, buf, dbuf, accbuf, sems, wsems, pixb,
        )


def _flat_bwd_tile(
    nx, tilesize, P, t, gi,
    counts_ref, starts_ref, tids_ref, tri_ref, attrsT_ref,
    gout_ref, fout_ref, dT_ref, buf, dbuf, accbuf, sems, wsems, pixb,
):
    cnt = counts_ref[t]
    # segment-aligned: windows [start, start + cnt_pad) exclusively owned
    start = pl.multiple_of(starts_ref[t], CHUNK)
    tid = tids_ref[t]
    bx = ((tid % nx) * tilesize).astype(jnp.float32)
    by = ((tid // nx) * tilesize).astype(jnp.float32)
    # full [P, 8] cotangent block: cols 0-3 are the rgb+d cotangents, col 4
    # is g_logT, cols 5-7 are zero (lastp is non-differentiable bookkeeping).
    # attrs8's zero rows 4-7 annihilate cols 4+ inside the g_w matmul, so
    # the whole block can be used unsliced.
    g_attrs8 = gout_ref[gi]
    g_logT = gout_ref[gi, :, 4:5]
    logT_fin = fout_ref[gi, :, OUT_LOGT : OUT_LOGT + 1]  # [P, 1]
    last_pos = fout_ref[gi, :, OUT_LASTP : OUT_LASTP + 1]  # [P, 1] 1-based
    # Early-stop mirror of the forward: entries past every pixel's last
    # contributor have inc == 0 and contribute nothing, so start the reverse
    # walk at the chunk holding max(last_pos) instead of the segment end.
    # Windows beyond it are never written — the zero-aliased dT output
    # already holds their (zero) gradients. max_last == 0 (no contributors,
    # e.g. a fully saturated-before tile) skips everything.
    max_last = jnp.max(last_pos).astype(jnp.int32)
    nchunks = jnp.minimum(pl.cdiv(cnt, CHUNK), pl.cdiv(max_last, CHUNK))

    def in_dma(k, slot):
        return pltpu.make_async_copy(
            attrsT_ref.at[:, pl.ds(start + k * CHUNK, CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        in_dma(nchunks - 1, 0).start()

    def body(r, carry):
        suffixL, suffixA = carry
        k = nchunks - 1 - r
        slot = jax.lax.rem(r, 2)

        @pl.when(r + 1 < nchunks)
        def _():
            in_dma(k - 1, jax.lax.rem(r + 1, 2)).start()

        in_dma(k, slot).wait()
        mx, my, ca, cb, cc, op, G, alpha, live, attrs8 = _flat_chunk_geometry(
            buf, slot, bx, by, pixb
        )
        pos1 = (
            k * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + 1
        ).astype(jnp.float32)
        inc = live * jnp.where(pos1 <= last_pos, 1.0, 0.0)  # [P, C]
        alpha = alpha * inc
        l = jnp.log1p(-alpha)  # zero where excluded

        # reverse (suffix-inclusive) cumsum along lanes: contract with the
        # TRANSPOSED triangular matrix
        S_rev = jax.lax.dot_general(
            l, tri_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logT_after = logT_fin - (suffixL + S_rev - l)
        T_before = jnp.exp(logT_after - l)
        w = alpha * T_before
        # attrs8's zero tail rows annihilate g_attrs8 cols 4-7
        g_w = jnp.dot(g_attrs8, attrs8, preferred_element_type=jnp.float32)
        gww = g_w * w
        A_rev = jax.lax.dot_general(
            gww, tri_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        A = suffixA + (A_rev - gww)  # strict suffix over j > i
        d_alpha = (g_w * T_before - (A + g_logT) / (1.0 - alpha)) * inc
        d_power = op * d_alpha * G
        # [8, C]: rows 0-3 are the rgb+d grads (land on dbuf rows
        # ROW_R..ROW_D); row 4 picks up sum_p g_logT*w which lands on dT pad
        # rows >= R_USED and is stripped by the routing slice
        d_attrs = jax.lax.dot_general(
            g_attrs8, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # Per-splat row sums over pixels as ONE matmul in the quadratic
        # pixel basis: M[b, c] = sum_p pixb[p, b] * d_power[p, c], then the
        # chain rule back to (mx, my, ca, cb, cc, op) is [1, C] work.
        M = jax.lax.dot_general(
            pixb, d_power, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [_NQ, C]
        S0, Sx, Sy = M[0:1], M[1:2], M[2:3]
        Sxx, Sxy, Syy = M[3:4], M[4:5], M[5:6]
        # rowsum(d_power * dx^k dy^m) with dx = mx - px (tile-local)
        r_dxdx = mx * mx * S0 - 2.0 * mx * Sx + Sxx
        r_dydy = my * my * S0 - 2.0 * my * Sy + Syy
        r_dxdy = mx * my * S0 - mx * Sy - my * Sx + Sxy
        r_dx = mx * S0 - Sx
        r_dy = my * S0 - Sy
        # rowsum(d_op) = rowsum(G * d_alpha) = rowsum(d_power) / op
        d_op_row = jnp.where(op > 0.0, S0 / op, 0.0)

        # Segment-aligned windows are exclusively owned, so every gradient
        # window is a plain double-buffered write — no read-modify-write.
        slot2 = jax.lax.rem(r, 2)

        def wr_dma(kk, ss):
            return pltpu.make_async_copy(
                accbuf.at[ss], dT_ref.at[:, pl.ds(start + kk * CHUNK, CHUNK)], wsems.at[ss]
            )

        @pl.when(r >= 2)
        def _():
            wr_dma(nchunks - 1 - (r - 2), slot2).wait()  # slot reuse guard

        # rows 0-5 geometry grads, rows 6-13 the d_attrs block (rows 10-13
        # are pad — stripped by the routing's [:R_USED] slice, as are the
        # never-written rows 14-15)
        dbuf[ROW_MX : ROW_MX + 1, :] = -(ca * r_dx + cb * r_dy)
        dbuf[ROW_MY : ROW_MY + 1, :] = -(cc * r_dy + cb * r_dx)
        dbuf[ROW_CA : ROW_CA + 1, :] = -0.5 * r_dxdx
        dbuf[ROW_CB : ROW_CB + 1, :] = -r_dxdy
        dbuf[ROW_CC : ROW_CC + 1, :] = -0.5 * r_dydy
        dbuf[ROW_OP : ROW_OP + 1, :] = d_op_row
        dbuf[ROW_R : ROW_R + 8, :] = d_attrs

        accbuf[slot2, :, :] = dbuf[:, :]
        wr_dma(k, slot2).start()

        suffixL = suffixL + jnp.sum(l, axis=1, keepdims=True)
        suffixA = suffixA + jnp.sum(gww, axis=1, keepdims=True)
        return suffixL, suffixA

    zeros = jnp.zeros((P, 1), jnp.float32)
    jax.lax.fori_loop(0, nchunks, body, (zeros, zeros))

    # drain outstanding gradient writes (reverse order: last two iterations
    # wrote windows k = 1 and k = 0)
    def _drain(rr):
        @pl.when((rr >= 0) & (rr < nchunks))
        def _():
            kk = nchunks - 1 - rr
            pltpu.make_async_copy(
                accbuf.at[jax.lax.rem(rr, 2)],
                dT_ref.at[:, pl.ds(start + kk * CHUNK, CHUNK)],
                wsems.at[jax.lax.rem(rr, 2)],
            ).wait()

    _drain(nchunks - 2)
    _drain(nchunks - 1)


def _pad_tiles(counts, starts, tile_ids):
    """Pad the tile axis to a GROUP multiple with empty tiles (cnt=0)."""
    T = counts.shape[0]
    pad = (-T) % GROUP
    if pad == 0:
        return counts, starts, tile_ids, T
    z = jnp.zeros((pad,), jnp.int32)
    return (
        jnp.concatenate([counts, z]),
        jnp.concatenate([starts, z]),
        jnp.concatenate([tile_ids, z]),
        T + pad,
    )


def _flat_fwd_impl(attrsT, counts, starts, tile_ids, nx, ny, tilesize):
    R, Lpad = attrsT.shape
    T = counts.shape[0]
    P = tilesize * tilesize
    counts, starts, tile_ids, T_pad = _pad_tiles(counts, starts, tile_ids)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T_pad // GROUP,),
        in_specs=[
            pl.BlockSpec((CHUNK, CHUNK), lambda i, c, s, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, _NQ), lambda i, c, s, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((GROUP, P, 8), lambda i, c, s, t: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_flat_fwd_kernel, nx, tilesize),
        out_shape=jax.ShapeDtypeStruct((T_pad, P, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts, starts, tile_ids, _tri_matrix(), _pix_basis(tilesize, P), attrsT)
    return out[:T]


def _flat_bwd_impl(attrsT, counts, starts, tile_ids, gout, fout, nx, ny, tilesize):
    R, Lpad = attrsT.shape
    T = counts.shape[0]
    P = tilesize * tilesize
    counts, starts, tile_ids, T_pad = _pad_tiles(counts, starts, tile_ids)
    if T_pad != T:
        zpad = jnp.zeros((T_pad - T, P, 8), jnp.float32)
        gout = jnp.concatenate([gout, zpad])
        fout = jnp.concatenate([fout, zpad])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T_pad // GROUP,),
        in_specs=[
            pl.BlockSpec((CHUNK, CHUNK), lambda i, c, s, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, _NQ), lambda i, c, s, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((GROUP, P, 8), lambda i, c, s, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, P, 8), lambda i, c, s, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((NUM_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, NUM_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dzero = jnp.zeros((NUM_ROWS, Lpad), jnp.float32)
    return pl.pallas_call(
        functools.partial(_flat_bwd_kernel, nx, tilesize),
        out_shape=jax.ShapeDtypeStruct((NUM_ROWS, Lpad), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={8: 0},
    )(counts, starts, tile_ids, _tri_matrix(), _pix_basis(tilesize, P), attrsT, gout, fout, dzero)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flat_gather_composite(attrs, bins, starts_slice, counts_slice, tile_ids, nx, ny, tilesize):
    """Composite the tiles described by (starts_slice, counts_slice,
    tile_ids) — the full grid for single-device use, or a shard's slice
    under tile sharding — with the scatter-free custom VJP."""
    out, _ = _flat_gather_fwd(attrs, bins, starts_slice, counts_slice, tile_ids, nx, ny, tilesize)
    return out


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


def _flat_gather_fwd(attrs, bins, starts_slice, counts_slice, tile_ids, nx, ny, tilesize):
    # segment-aligned layout (see _aligned_attrsT); starts_slice must be
    # bins.aligned_starts.
    attrsT = _aligned_attrsT(attrs, bins)
    out = _flat_fwd_impl(
        attrsT, counts_slice, starts_slice, tile_ids, nx, ny, tilesize
    )
    return out, (attrsT, bins, starts_slice, counts_slice, tile_ids, attrs.shape[0], out)


def _flat_gather_bwd(nx, ny, tilesize, res, gout):
    attrsT, bins, starts_slice, counts_slice, tile_ids, n_attr, fout = res
    L = bins.orig_idx_sorted.shape[0]
    R_USED = ROW_D + 1  # rows 10..NUM_ROWS-1 never carry gradients
    dT = _flat_bwd_impl(
        attrsT, counts_slice, starts_slice, tile_ids, gout, fout, nx, ny, tilesize
    )
    # barriers: keep the transpose, the row gathers, and the cumsum as
    # separate vectorized ops (fused gather+transpose serializes; see
    # _flat_gather_fwd)
    d_aligned = jax.lax.optimization_barrier(dT[:R_USED].T)  # [L_pad, R_USED]
    # rows for real entries, in gaussian-major (presort) order; pad slots
    # are never referenced and dead presort slots are masked below
    d_presort = d_aligned[bins.aligned_pos_of_presort]
    e = jnp.arange(L, dtype=jnp.int32)
    d_presort = d_presort * (e < bins.total_entries)[:, None]
    csum = jax.lax.optimization_barrier(jnp.cumsum(d_presort, axis=0))
    seg_end = jnp.clip(bins.seg_offsets + bins.seg_counts - 1, 0, L - 1)
    end_vals = csum[seg_end]
    start_prev = jnp.where(
        (bins.seg_offsets > 0)[:, None],
        csum[jnp.clip(bins.seg_offsets - 1, 0, L - 1)],
        0.0,
    )
    sums_rank = jnp.where((bins.seg_counts > 0)[:, None], end_vals - start_prev, 0.0)
    d_attrs = jax.lax.optimization_barrier(sums_rank)[bins.inv_order]
    d_attrs = jnp.concatenate(
        [
            d_attrs,
            jnp.zeros((d_attrs.shape[0], NUM_ROWS - R_USED), d_attrs.dtype),
        ],
        axis=1,
    )
    d_attrs = jnp.concatenate(
        [d_attrs, jnp.zeros((n_attr - d_attrs.shape[0], NUM_ROWS), d_attrs.dtype)],
        axis=0,
    )

    from jax.dtypes import float0

    d_bins = jax.tree_util.tree_map(lambda x: np.zeros(x.shape, float0), bins)
    z = lambda x: np.zeros(x.shape, float0)
    return d_attrs, d_bins, z(starts_slice), z(counts_slice), z(tile_ids)


flat_gather_composite.defvjp(_flat_gather_fwd, _flat_gather_bwd)


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


def _prefix_sublanes(x, tri32):
    """Inclusive prefix sum of x [SCHUNK, P] along SUBLANES via NSUB
    independent [SUB, SUB] triangular matmuls + a cheap carry combine —
    SCHUNK/SUB times fewer MXU MACs than one [SCHUNK, SCHUNK] triangular
    matmul (the tri matmuls dominate the stream kernels' MXU work)."""
    nsub = SCHUNK // SUB
    pieces = []
    carry = None
    for g in range(nsub):
        xg = x[g * SUB : (g + 1) * SUB, :]
        sg = jax.lax.dot_general(
            tri32, xg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [SUB, P] inclusive within the group
        pieces.append(sg if carry is None else sg + carry)
        tot = sg[SUB - 1 : SUB, :]
        carry = tot if carry is None else carry + tot
    return jnp.concatenate(pieces, axis=0)



PEN_BIG = 1e9  # added to `power` for pixels outside the semantic rect: far
# above POWER_EPS so the standard power test excludes them exactly (replaying
# CUDA rect membership), far below fp32 overflow when summed with any real
# quadratic-form value (|a0| < ~1e8 at 4K image scale)


def _stream_entry_coefs(ablk_ref, sl, bx, by, sub):
    """Per-chunk, per-entry coefficient rows for the fused quadratic-basis
    matmul. Returns (a0, logop, tail [7, 2C]) — the a0 row is finalized per
    pixel block by _stream_block_alpha (the semantic-rect penalty differs
    per block when `sub` is set) — plus the unpacked rect bounds (or None)
    and the geometry rows.

    Notes on Mosaic layouts: every concat operand must share the source
    slices' vector layout — rows reuse sliced quantities (a1/a2) rather
    than jnp.zeros, because constants carry lane offset 0 while
    SCHUNK-offset slices carry offset j*SCHUNK and Mosaic rejects sublane
    concats with mismatched lane offsets. Tail rows 6-7 are annihilated by
    pixb's zero columns 6-7.

    ONE fused matmul for both quadratic forms: (power, power + log op)
    stack on the LANE axis so a single MXU pass yields [2C, PB] — one
    dependent-matmul latency chain per block instead of two."""
    mx = ablk_ref[ROW_MX : ROW_MX + 1, sl] - bx  # [1, C] tile-local
    my = ablk_ref[ROW_MY : ROW_MY + 1, sl] - by
    ca = ablk_ref[ROW_CA : ROW_CA + 1, sl]
    cb = ablk_ref[ROW_CB : ROW_CB + 1, sl]
    cc = ablk_ref[ROW_CC : ROW_CC + 1, sl]
    op = ablk_ref[ROW_OP : ROW_OP + 1, sl]
    a1 = ca * mx + cb * my
    a2 = cc * my + cb * mx
    a0 = -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my
    logop = jnp.log(op)  # -inf on the zero sentinel row => alpha == 0
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
    return (a0, logop, tail), rect, (mx, my, ca, cb, cc, op)


def _stream_block_alpha(parts, rect, pixb, gx, gy):
    """Evaluate one chunk's coefficients against one [PB, _NQ] pixel-basis
    block: returns ([C, PB]) alpha (live-masked), alpha_pre, live, power.

    When `rect` is set, the block covers exactly ONE semantic sub-tile
    (see _pix_basis) at global semantic-grid coordinates (gx, gy), so rect
    membership is a per-entry row constant: outside entries get PEN_BIG
    added to a0, which drives `power` past POWER_EPS and excludes them via
    the standard live test — zero extra matmul work vs the baseline."""
    a0, logop, tail = parts
    if rect is not None:
        minx, maxx1, miny, maxy1 = rect
        outside = (gx < minx) | (maxx1 < gx) | (gy < miny) | (maxy1 < gy)
        a0 = a0 + jnp.where(outside, PEN_BIG, 0.0)
    coef = jnp.concatenate(
        [jnp.concatenate([a0, a0 + logop], axis=1), tail], axis=0
    )  # [_NQ, 2C]
    pp = jax.lax.dot_general(
        coef, pixb, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [2C, PB]
    C = a0.shape[1]
    power = pp[:C]
    powop = pp[C:]
    alpha_pre = jnp.exp(powop - jnp.maximum(power, 0.0))  # == op * exp(min(power, 0))
    alpha = jnp.minimum(ALPHA_MAX, alpha_pre)
    live = jnp.where((power <= POWER_EPS) & (alpha >= ALPHA_MIN), 1.0, 0.0)
    alpha = alpha * live
    return alpha, alpha_pre, live, power


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
    pblk = min(P, PBLK)
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
        parts, rect, _ = _stream_entry_coefs(ablk_ref, sl, bx, by, sub)
        attrs8 = ablk_ref[ROW_R : ROW_R + 8, sl]  # [8, C]
        nsx = 1 if sub is None else tilesize // sub
        for pb in range(P // pblk):
            psl = slice(pb * pblk, (pb + 1) * pblk)
            gx = gy = None
            if sub is not None:
                # block pb = semantic sub-tile (qy, qx); global coords
                gx = bx * (1.0 / sub) + (pb % nsx)
                gy = by * (1.0 / sub) + (pb // nsx)
            logT = jnp.where(head, 0.0, st_logT[:, psl])  # [1, PB]
            done = jnp.where(head, 0.0, st_done[:, psl])
            acc_in = jnp.where(head, 0.0, st_acc[:, psl])
            alpha, *_ = _stream_block_alpha(parts, rect, pixb_ref[psl, :], gx, gy)
            l = jnp.log1p(-alpha)  # [C, PB]
            # inclusive prefix over entries (sublanes)
            S = _prefix_sublanes(l, tri_ref[:])
            logT_after = logT + S
            inc = jnp.where(logT_after >= LOG_T_EPS, 1.0, 0.0) * (1.0 - done)
            T_before = jnp.exp(logT_after - l)
            w = alpha * T_before * inc  # [C, PB]
            st_acc[:, psl] = acc_in + jax.lax.dot_general(
                attrs8, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
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
    tri_ref, pixb_ref, ablk_ref, outblk_ref, prevblk_ref, gblk_ref,
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
            pixb_ref, ablk_ref, outblk_ref, prevblk_ref, gblk_ref,
            totblk_ref, dblk_ref, i,
        )


def _stream_bwd_block(
    nx, tilesize, T_total, sub, tile_c_ref, k_c_ref, tri_ref, pixb_ref,
    ablk_ref, outblk_ref, prevblk_ref, gblk_ref, totblk_ref, dblk_ref, i,
):
    P = tilesize * tilesize
    pblk = min(P, PBLK)
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
            MT = None
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
                pixb = pixb_ref[psl, :]  # [PB, _NQ]
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
                alpha, alpha_pre, live, power = _stream_block_alpha(
                    parts, rect, pixb, gx, gy
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
                g_w = jax.lax.dot_general(
                    attrs8[0:G_ROWS], g8, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [C, PB]  (row 4 of the operand is a zero attr row, so
                # the logT cotangent cannot leak into g_w)
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
                da = jax.lax.dot_general(
                    g8, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G_ROWS, C] (row 4 = g_logT * w, never routed: R_USED
                # stops at ROW_D)
                # per-entry pixel sums via the quadratic basis:
                # MT[b, c] = sum_p pixb[p, b] * d_power[c, p]
                mt = jax.lax.dot_general(
                    pixb, d_power, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [_NQ, C]
                d_attrs_rows = da if d_attrs_rows is None else d_attrs_rows + da
                MT = mt if MT is None else MT + mt
            S0, Sx, Sy = MT[0:1], MT[1:2], MT[2:3]
            Sxx, Sxy, Syy = MT[3:4], MT[4:5], MT[5:6]
            mx, my, ca, cb, cc, op = geo_rows  # [1, C] tile-local rows
            r_dx = mx * S0 - Sx
            r_dy = my * S0 - Sy
            r_dxdx = mx * mx * S0 - 2.0 * mx * Sx + Sxx
            r_dydy = my * my * S0 - 2.0 * my * Sy + Syy
            r_dxdy = mx * my * S0 - mx * Sy - my * Sx + Sxy
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


def _stream_fwd_impl(attrsT, tile_of_chunk, k_of_chunk, nx, ny, tilesize, sub=None):
    R, Lpad = attrsT.shape
    nbc = Lpad // SCHUNK
    grid = Lpad // (CPB * SCHUNK)
    P = tilesize * tilesize
    T_total = nx * ny
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((SUB, SUB), lambda i, tc, kc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, _NQ), lambda i, tc, kc: (0, 0), memory_space=pltpu.VMEM),
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
    )(tile_of_chunk, k_of_chunk, _tri_matrix(SUB), _pix_basis(tilesize, P, sub), attrsT)


def _stream_bwd_impl(attrsT, tile_of_chunk, k_of_chunk, out_chunks, gchunks, totchunks, nx, ny, tilesize, sub=None):
    R, Lpad = attrsT.shape
    nbc = Lpad // SCHUNK
    grid = Lpad // (CPB * SCHUNK)
    P = tilesize * tilesize
    T_total = nx * ny
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((SUB, SUB), lambda i, tc, kc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, _NQ), lambda i, tc, kc: (0, 0), memory_space=pltpu.VMEM),
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
    )(tile_of_chunk, k_of_chunk, _tri_matrix(SUB), _pix_basis(tilesize, P, sub), attrsT, out_chunks, out_chunks, gchunks, totchunks)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def stream_gather_composite(attrs, bins, nx, ny, tilesize, sub=None):
    """Stream-kernel compositing of the full tile grid: returns [T, 5, P]
    (rows OUT_R..OUT_D premultiplied rgb+depth, OUT_LOGT the final log
    transmittance), with the same scatter-free custom VJP routing as
    flat_gather_composite. `sub` (the semantic tile, e.g. 16) activates the
    per-pixel semantic-rect replay when tilesize is a coarser processing
    tile."""
    out, _ = _stream_gather_fwd(attrs, bins, nx, ny, tilesize, sub)
    return out


def _stream_gather_fwd(attrs, bins, nx, ny, tilesize, sub=None):
    attrsT = _aligned_attrsT(attrs, bins)  # [R, L_pad]
    out_chunks = _stream_fwd_impl(
        attrsT, bins.tile_of_chunk, bins.k_of_chunk, nx, ny, tilesize, sub
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


def _route_by_sort(dT, bins, n_attr, R_USED):
    """Entry->Gaussian gradient reduction via ONE (key, payloads) sort.

    Sort the per-entry gradient rows by ORIGINAL Gaussian index (the
    existing orig_idx_aligned array; pad/sentinel slots carry key N and
    land — together with any uninitialized rows from skipped sentinel
    blocks — in a suffix run that is never read). Each Gaussian then owns a
    contiguous run, located with the two-level sampled search; runs tile
    the array contiguously, so per-Gaussian sums are the SHIFTED differences
    of one cumsum boundary row-gather, directly in original-index order (no
    rank->orig reorder). The row-major dT feeds the sort as 10 contiguous
    [L_pad] column views — the entry-major transpose of the gather path
    disappears too."""
    from scgaussian_tpu.renderer.binning import _tile_starts

    n = n_attr - 1  # attrs carries the +1 sentinel row
    L_pad = dT.shape[1]
    keys = jax.lax.optimization_barrier(bins.orig_idx_aligned)
    routed = jax.lax.sort(
        (keys,) + tuple(dT[i] for i in range(R_USED)), num_keys=1
    )
    starts_g = _tile_starts(routed[0], n)  # [N + 1] run boundaries
    d_sorted = jnp.stack(routed[1:], axis=1)  # [L_pad, R_USED]
    csum = jax.lax.optimization_barrier(jnp.cumsum(d_sorted, axis=0))
    seg_last = starts_g[1:] - 1  # [N] inclusive run end (== next run start - 1)
    # NaN-safe select: with zero real entries the clipped gather can read a
    # garbage row from a skipped sentinel block
    end_vals = jnp.where(
        (seg_last >= 0)[:, None], csum[jnp.clip(seg_last, 0, L_pad - 1)], 0.0
    )
    start_prev = jnp.concatenate(
        [jnp.zeros((1, R_USED), end_vals.dtype), end_vals[:-1]], axis=0
    )
    d_attrs = end_vals - start_prev  # [N, R_USED] original-index order
    d_attrs = jnp.concatenate(
        [d_attrs, jnp.zeros((n, NUM_ROWS - R_USED), d_attrs.dtype)], axis=1
    )
    return jnp.concatenate(
        [d_attrs, jnp.zeros((1, NUM_ROWS), d_attrs.dtype)], axis=0
    )


def _stream_gather_bwd(nx, ny, tilesize, sub, res, gout):
    attrsT, bins, fout, out_chunks, n_attr = res
    L = bins.orig_idx_sorted.shape[0]
    R_USED = ROW_D + 1
    nbc = attrsT.shape[1] // SCHUNK
    T_full = nx * ny
    tile_c = jnp.clip(bins.tile_of_chunk[:nbc], 0, T_full - 1)
    # chunk-gather the per-tile cotangents and gww totals so the kernel
    # reads them on the same auto-pipeline as the attribute stream ([T]-row
    # gathers of 8 KB rows); barriers keep the gathers unfused from their
    # producer chains (fused gathers serialize)
    tot_tile = jnp.sum(gout[:, 0:4, :] * fout[:, 0:4, :], axis=1, keepdims=True)
    tile_c, gout, tot_tile = jax.lax.optimization_barrier((tile_c, gout, tot_tile))
    gchunks = gout[tile_c]  # gout is already [T, G_ROWS, P]
    totchunks = tot_tile[tile_c]
    dT = _stream_bwd_impl(
        attrsT, bins.tile_of_chunk, bins.k_of_chunk, out_chunks,
        gchunks, totchunks, nx, ny, tilesize, sub,
    )  # [NUM_ROWS, L_pad] row-major (the kernel's row-space store)
    if L >= SORT_ROUTE_MIN_L:
        return _route_by_sort(dT, bins, n_attr, R_USED), _zero_dbins(bins)
    # ONE XLA transpose to entry-major for the routing gather (replaces
    # 8192 in-kernel [8, C] transposes); barrier keeps the transpose and the
    # gather as separate vectorized ops (fused they serialize; see
    # _flat_gather_bwd)
    d_aligned = jax.lax.optimization_barrier(dT[:R_USED].T)
    d_presort = d_aligned[bins.aligned_pos_of_presort]
    e = jnp.arange(L, dtype=jnp.int32)
    # NaN-safe select (not multiply): invalid presort slots clip into
    # skipped fully-sentinel blocks whose dblk rows are uninitialized
    d_presort = jnp.where((e < bins.total_entries)[:, None], d_presort, 0.0)
    csum = jax.lax.optimization_barrier(jnp.cumsum(d_presort, axis=0))
    # ONE boundary gather instead of two: segments are contiguous in depth
    # rank, so the previous segment's end value is just the SHIFTED end-value
    # row (empty segments read their predecessor's end and difference to 0)
    seg_last = bins.seg_offsets + bins.seg_counts - 1  # [N] inclusive end
    end_vals = csum[jnp.clip(seg_last, 0, L - 1)] * (seg_last >= 0)[:, None]
    start_prev = jnp.concatenate(
        [jnp.zeros((1, end_vals.shape[1]), end_vals.dtype), end_vals[:-1]], axis=0
    )
    sums_rank = end_vals - start_prev
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
