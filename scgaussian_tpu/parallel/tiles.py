"""Tile-sharded rendering: the sequence/context-parallel analog (SURVEY 5.7).

Shards the rasterizer's tile grid across the mesh with `shard_map`: every
device projects + bins the full primitive set (cheap, replicated), then
composites ONLY its contiguous slice of tiles with the Pallas kernel (the
dominant cost at dense resolutions), and the image shards concatenate back.
Per-tile work is embarrassingly parallel; the only collective is the output
all-gather implied by the out_specs.

This is the single-image latency scaling axis; camera-batch DP
(parallel/dp.py) is the throughput axis. Both ride XLA collectives over ICI.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from scgaussian_tpu.renderer import tile_raster as tr
from scgaussian_tpu.renderer.binning import bin_gaussians
from scgaussian_tpu.renderer.project import ProjectedGaussians


def rasterize_tile_sharded(
    mesh: Mesh,
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    tile: int = 16,
    max_per_tile: int = 1024,
    entry_budget: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Like tile_raster.rasterize but with the tile axis sharded over
    `mesh`'s first axis. Forward-only (rendering/eval); training uses DP."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = proj.depth.shape[0]
    if entry_budget is None:
        entry_budget = max(8 * n, 1 << 14)

    nx = (width + tile - 1) // tile
    ny = (height + tile - 1) // tile
    T = nx * ny
    # pad tile count to a multiple of the mesh size
    T_pad = ((T + n_dev - 1) // n_dev) * n_dev

    bins = bin_gaussians(proj, width, height, tile, entry_budget)

    attrs = tr.attrs_matrix(proj)

    pad = T_pad - T
    starts_p = jnp.concatenate(
        [bins.starts[:T], jnp.full((pad,), bins.starts[T], jnp.int32)]
    )
    counts_p = jnp.concatenate([bins.counts, jnp.zeros((pad,), jnp.int32)])
    tile_ids_p = jnp.arange(T_pad, dtype=jnp.int32)
    L = bins.orig_idx_sorted.shape[0]
    sorted_attrs = attrs[bins.orig_idx_sorted]  # replicated gather

    def shard_fn(sorted_attrs, starts_l, counts_l, tids_l):
        K = max_per_tile
        k = jnp.arange(K, dtype=jnp.int32)
        dest = starts_l[:, None] + k[None, :]
        valid_k = k[None, :] < jnp.minimum(counts_l, K)[:, None]
        rows = sorted_attrs[jnp.clip(dest, 0, L - 1)] * valid_k[..., None]
        tile_data = rows.transpose(0, 2, 1)
        return tr._composite_fwd_impl(
            tile_data, jnp.minimum(counts_l, K), nx, ny, tile, tile_ids=tids_l
        )

    out = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(sorted_attrs, starts_p, counts_p, tile_ids_p)

    out = out[:T]
    img = out.reshape(ny, nx, tile, tile, 8).transpose(0, 2, 1, 3, 4)
    img = img.reshape(ny * tile, nx * tile, 8)[:height, :width]
    acc_rgb = img[..., tr.OUT_R : tr.OUT_B + 1]
    acc_d = img[..., tr.OUT_D]
    T_fin = jnp.exp(img[..., tr.OUT_LOGT])
    color_out = acc_rgb + T_fin[..., None] * bg_color[None, None, :]
    return color_out.transpose(2, 0, 1), acc_d[None], (1.0 - T_fin)[None]
