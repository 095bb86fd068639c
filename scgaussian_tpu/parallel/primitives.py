"""Primitive ("tensor-parallel" analog) + tile sharding on a 2-D mesh.

SURVEY.md §2.3: shard the N-Gaussian axis for projection (and its backward)
across one mesh axis, all-gather the small projected screen-space attributes
(~64 B/Gaussian), then shard the compositing tile grid across the other
axis. Collectives are inserted by shard_map/autodiff: the all-gather's
transpose is a reduce-scatter of attribute gradients back to the owning
shard — exactly the hand-written CUDA+NCCL pattern the reference never had,
expressed as SPMD.

Layout guidance (scaling-book recipe): the primitive axis pays off at large
N (projection + per-primitive backward are N-bound), the tile axis at large
resolutions; both ride ICI.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from scgaussian_tpu.core.cameras import Camera
from scgaussian_tpu.renderer import project as project_mod
from scgaussian_tpu.renderer import tile_raster as tr
from scgaussian_tpu.renderer.binning import bin_gaussians, default_entry_budget


def make_mesh_2d(n_prim: int, n_tiles: int) -> Mesh:
    devs = jax.devices()[: n_prim * n_tiles]
    arr = jax.make_mesh((n_prim, n_tiles), ("prim", "tiles"), devices=devs)
    return Mesh(arr.devices, ("prim", "tiles"))


def render_sharded(
    mesh: Mesh,
    camera: Camera,
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    shs: jnp.ndarray,
    bg_color: jnp.ndarray,
    active_sh_degree: int = 3,
    tile: int = 16,
    entry_budget: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fully sharded differentiable render on a ("prim", "tiles") mesh.

    The primitive axis must divide N; the tile grid is padded to the tile
    axis size. Gradients flow to all inputs (shard_map transposes the
    all-gather into a reduce-scatter automatically).
    """
    n = means3d.shape[0]
    n_prim = mesh.shape["prim"]
    n_tile_dev = mesh.shape["tiles"]
    assert n % n_prim == 0, (n, n_prim)

    W, H = camera.width, camera.height
    nx = (W + tile - 1) // tile
    ny = (H + tile - 1) // tile
    T = nx * ny
    T_pad = ((T + n_tile_dev - 1) // n_tile_dev) * n_tile_dev
    if entry_budget is None:
        entry_budget = default_entry_budget(n)

    def shard_fn(means, opac, scl, rot, sh):
        # --- projection on the local primitive shard
        proj_local = project_mod.project(
            camera, means, opac, scales=scl, rotations=rot, shs=sh,
            active_sh_degree=active_sh_degree,
        )
        # --- all-gather the small screen-space attributes over "prim"
        def ag(x):
            g = jax.lax.all_gather(x, "prim", axis=0)
            return g.reshape((-1,) + x.shape[1:])

        proj = project_mod.ProjectedGaussians(
            mean2d=ag(proj_local.mean2d),
            depth=ag(proj_local.depth),
            conic=ag(proj_local.conic),
            color=ag(proj_local.color),
            opacity=ag(proj_local.opacity),
            radius=ag(proj_local.radius),
            valid=ag(proj_local.valid),
            ext=ag(proj_local.ext),
        )

        # --- binning replicated (index computation), composite on the local
        # tile slice
        bins = bin_gaussians(proj, W, H, tile, entry_budget)
        attrs = tr.attrs_matrix(proj)

        t_idx = jax.lax.axis_index("tiles")
        t_local = T_pad // n_tile_dev
        lo = t_idx * t_local
        starts_l = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([bins.aligned_starts[:T], jnp.full((T_pad - T,), bins.aligned_starts[T], jnp.int32)]),
            lo, t_local,
        )
        counts_l = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([bins.counts, jnp.zeros((T_pad - T,), jnp.int32)]), lo, t_local
        )
        tids_l = lo + jnp.arange(t_local, dtype=jnp.int32)
        out_local = tr.flat_gather_composite(
            attrs, bins, starts_l, counts_l, tids_l, nx, ny, tile
        )
        # --- gather the image tiles over "tiles"
        out = jax.lax.all_gather(out_local, "tiles", axis=0).reshape(T_pad, tile * tile, 8)
        return out

    out = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("prim"), P("prim"), P("prim"), P("prim"), P("prim")),
        out_specs=P(),
        check_vma=False,
    )(means3d, opacities, scales, rotations, shs)

    img = out[:T].reshape(ny, nx, tile, tile, 8).transpose(0, 2, 1, 3, 4)
    img = img.reshape(ny * tile, nx * tile, 8)[:H, :W]
    acc_rgb = img[..., tr.OUT_R : tr.OUT_B + 1]
    acc_d = img[..., tr.OUT_D]
    T_fin = jnp.exp(img[..., tr.OUT_LOGT])
    color_out = acc_rgb + T_fin[..., None] * bg_color[None, None, :]
    return color_out.transpose(2, 0, 1), acc_d[None], (1.0 - T_fin)[None]
