"""Tile-sharded rendering: the sequence/context-parallel analog (SURVEY 5.7).

Shards the rasterizer's PROCESSING-tile grid by contiguous ROW slices across
the mesh with `shard_map`: every device projects the full primitive set
(cheap, replicated), bins ONLY its own row slice of the tile grid
(`bin_gaussians(row_lo, ny_rows)` — entries touching other slices are never
emitted), composites its slice with the v3 STREAM Pallas kernels (ptile
coarse processing grid + semantic-rect replay included), and the image row
shards concatenate back. Per-tile entry sets, depth order and chunk
alignment are identical to the unsharded bin, so each tile's output is
bitwise-equal to the single-device path; the only collectives are the output
all-gather implied by the out_specs and — in the backward — the psum of
per-shard attribute gradients that shard_map's transpose inserts
automatically (attrs is a replicated input).

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
    ptile: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Like tile_raster.rasterize but with the processing-tile grid's rows
    sharded over `mesh`'s first axis, on the same stream kernels (per-tile
    bitwise-equal to the single-device path). Differentiable: gradients flow
    to all projected attributes (per-shard partials psum'd by the shard_map
    transpose). `entry_budget` is PER SHARD (each shard bins only its rows).

    Returns (color [3,H,W], depth [1,H,W], alpha [1,H,W], overflow [])."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = proj.depth.shape[0]
    if ptile is None:
        ptile = tile
    if entry_budget is None:
        # per-shard budget: coverage splits ~evenly across row slices, with
        # the same 16k floor as the single-device default
        entry_budget = max(
            default_entry_budget(n, ptile // tile) // n_dev, 1 << 14
        )

    nx = (width + ptile - 1) // ptile
    ny = (height + ptile - 1) // ptile
    ny_pad = ((ny + n_dev - 1) // n_dev) * n_dev  # pad rows to the mesh size
    rows_per = ny_pad // n_dev
    sub = tile if ptile != tile else None
    attrs = tr.attrs_matrix(proj, width=width, height=height, sem_tile=sub)

    def shard_fn(attrs_l, proj_l):
        row_lo = jax.lax.axis_index(axis) * rows_per
        bins = bin_gaussians(
            proj_l, width, height, tile, entry_budget,
            chunk=tr.SCHUNK, ptile=ptile, row_lo=row_lo, ny_rows=rows_per,
        )
        out5 = tr.stream_gather_composite(
            attrs_l, bins, nx, rows_per, ptile, sub, ny_pad
        )  # [T_local, 5, P]
        return out5, jax.lax.psum(bins.overflow, axis)

    out5, overflow = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(axis), P()),
        check_vma=False,
    )(attrs, proj)

    color, depth, alpha = tr.assemble_image(
        out5, bg_color, nx, ny_pad, ptile, sub, width, height
    )
    return color, depth, alpha, overflow
