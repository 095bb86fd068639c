"""User-facing render API.

Mirrors the contract of the reference `render()`
(`gaussian_renderer/__init__.py:20-118`): takes a camera + raw Gaussian
attributes, returns RGB image, rendered depth, rendered alpha, screen radii
and a visibility mask. Instead of the reference's dummy `screenspace_points`
tensor whose `.grad` is harvested for densification
(`gaussian_renderer/__init__.py:27-32`), callers pass `mean2d_offset`
(zeros, [N, 2] in pixel units) and differentiate the loss w.r.t. it — the
functional JAX equivalent.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from scgaussian_tpu.core.cameras import Camera
from scgaussian_tpu.renderer import oracle as oracle_mod
from scgaussian_tpu.renderer import project as project_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderOutput:
    render: jnp.ndarray  # [3, H, W]
    rendered_depth: jnp.ndarray  # [1, H, W]
    rendered_alpha: jnp.ndarray  # [1, H, W]
    radii: jnp.ndarray  # [N] int32
    visibility_filter: jnp.ndarray  # [N] bool (radii > 0)
    overflow: jnp.ndarray  # [] int32: tile entries dropped over entry_budget
    # (0 == exact CUDA unbudgeted semantics; the oracle backend never drops).


def render(
    camera: Camera,
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    bg_color: jnp.ndarray,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    active_sh_degree: int = 0,
    scaling_modifier: float = 1.0,
    mean2d_offset: Optional[jnp.ndarray] = None,
    backend: str = "tpu",
    tile: int = oracle_mod.TILE,
    entry_budget: Optional[int] = None,
    aligned_budget: Optional[int] = None,
    ptile: Optional[int] = None,
    tile_cull: bool = True,
) -> RenderOutput:
    """Render one view. `backend` is "tpu" (Pallas kernels) or "oracle"."""
    proj = project_mod.project(
        camera,
        means3d,
        opacities,
        scales=scales,
        rotations=rotations,
        shs=shs,
        colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp,
        active_sh_degree=active_sh_degree,
        scaling_modifier=scaling_modifier,
    )
    if mean2d_offset is not None:
        proj = dataclasses.replace(proj, mean2d=proj.mean2d + mean2d_offset)

    if backend == "oracle":
        img, dep, alp = oracle_mod.composite_dense(
            proj, camera.width, camera.height, bg_color, tile=tile
        )
        overflow = jnp.int32(0)
    elif backend == "tpu":
        from scgaussian_tpu.renderer import tile_raster

        img, dep, alp, overflow = tile_raster.rasterize(
            proj,
            camera.width,
            camera.height,
            bg_color,
            tile=tile,
            entry_budget=entry_budget,
            aligned_budget=aligned_budget,
            ptile=ptile,
            tile_cull=tile_cull,
        )
    else:
        raise ValueError(f"unknown backend: {backend!r}")

    return RenderOutput(
        render=img,
        rendered_depth=dep,
        rendered_alpha=alp,
        radii=proj.radius,
        visibility_filter=proj.valid,
        overflow=overflow,
    )
