"""Tile-sharded rendering: the sequence/context-parallel analog (SURVEY 5.7).

Shards the rasterizer's tile grid across the mesh with `shard_map`: every
device projects + bins the full primitive set (cheap, replicated), then
composites ONLY its contiguous slice of tiles with the flat-DMA Pallas
kernels (the dominant cost at dense resolutions), and the image shards
concatenate back. Per-tile work is embarrassingly parallel; the only
collectives are the output all-gather implied by the out_specs and — in the
backward — the psum of per-shard attribute gradients that shard_map's
transpose inserts automatically.

Built on `flat_gather_composite` (exact per-tile CUDA semantics at arbitrary
depth — no per-tile K cap) with its scatter-free custom VJP, so a
tile-sharded render is fully differentiable and parity-equal to the
single-device path; `parallel/primitives.py` composes the same pattern with
a primitive-sharded projection on a 2-D mesh.

This is the single-image latency scaling axis; camera-batch DP
(parallel/dp.py) is the throughput axis. Both ride XLA collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from scgaussian_tpu.renderer import tile_raster as tr
from scgaussian_tpu.renderer.binning import bin_gaussians, default_entry_budget
from scgaussian_tpu.renderer.project import ProjectedGaussians


def rasterize_tile_sharded(
    mesh: Mesh,
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    tile: int = 16,
    entry_budget: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Like tile_raster.rasterize but with the tile axis sharded over
    `mesh`'s first axis. Differentiable: gradients flow to all projected
    attributes (per-shard partials psum'd by the shard_map transpose).

    Returns (color [3,H,W], depth [1,H,W], alpha [1,H,W], overflow [])."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = proj.depth.shape[0]
    if entry_budget is None:
        entry_budget = default_entry_budget(n)

    nx = (width + tile - 1) // tile
    ny = (height + tile - 1) // tile
    T = nx * ny
    # pad tile count to a multiple of the mesh size
    T_pad = ((T + n_dev - 1) // n_dev) * n_dev

    bins = bin_gaussians(proj, width, height, tile, entry_budget)
    attrs = tr.attrs_matrix(proj)

    pad = T_pad - T
    starts_p = jnp.concatenate(
        [bins.aligned_starts[:T], jnp.full((pad,), bins.aligned_starts[T], jnp.int32)]
    )
    counts_p = jnp.concatenate([bins.counts, jnp.zeros((pad,), jnp.int32)])
    tile_ids_p = jnp.arange(T_pad, dtype=jnp.int32)

    def shard_fn(attrs, bins, starts_l, counts_l, tids_l):
        return tr.flat_gather_composite(
            attrs, bins, starts_l, counts_l, tids_l, nx, ny, tile
        )

    out = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(attrs, bins, starts_p, counts_p, tile_ids_p)

    out = out[:T]
    img = out.reshape(ny, nx, tile, tile, 8).transpose(0, 2, 1, 3, 4)
    img = img.reshape(ny * tile, nx * tile, 8)[:height, :width]
    acc_rgb = img[..., tr.OUT_R : tr.OUT_B + 1]
    acc_d = img[..., tr.OUT_D]
    T_fin = jnp.exp(img[..., tr.OUT_LOGT])
    color_out = acc_rgb + T_fin[..., None] * bg_color[None, None, :]
    return color_out.transpose(2, 0, 1), acc_d[None], (1.0 - T_fin)[None], bins.overflow
