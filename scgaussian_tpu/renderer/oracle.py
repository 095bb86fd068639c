"""Readable dense reference rasterizer — the test oracle.

Implements exactly the per-pixel compositing semantics of the CUDA
`renderCUDA` loop (diff_gaussian_rasterization + ashawkey's depth/alpha fork,
consumed at `gaussian_renderer/__init__.py:100-108`):

    for each Gaussian front-to-back (sorted by view z, index tie-break):
        d     = mean2d - pix
        power = -0.5*(a*dx^2 + c*dy^2) - b*dx*dy        (skip if power > 0)
        alpha = min(0.99, opacity * exp(power))          (skip if < 1/255)
        T_new = T * (1 - alpha)                          (stop if < 1e-4)
        C += color * alpha * T;  D += depth * alpha * T;  T = T_new
    out_color = C + T * bg;  out_depth = D;  out_alpha = 1 - T

plus the CUDA renderer's tile-level truncation: a Gaussian contributes only
to pixels whose tile lies inside its screen bounding rect (getRect semantics,
tile = 16). This file is deliberately simple jnp (scan over Gaussians, dense
pixel grid) — slow, differentiable via autodiff, and the semantic spec the
Pallas kernels are tested against.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from scgaussian_tpu.renderer.project import ProjectedGaussians, tile_rect

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
TILE = 16


def depth_order(depth: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Front-to-back ordering: ascending view z, stable in index (matching the
    CUDA stable radix sort over positive float depth keys). Invalid entries are
    pushed to the back so truncated compositing budgets spend on live ones."""
    key = jnp.where(valid, depth, jnp.inf)
    return jnp.argsort(key, stable=True)


def composite_dense(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    tile: int = TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense all-pixels compositing via lax.scan over sorted Gaussians.

    Returns (color [3, H, W], depth [1, H, W], alpha [1, H, W]).
    """
    order = depth_order(proj.depth, proj.valid)
    mean2d = proj.mean2d[order]
    depth = proj.depth[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opac = proj.opacity[order]
    radius = proj.radius[order]
    valid = proj.valid[order]

    # tile <= 0 selects the SMOOTH variant used by gradchecks: no tile-rect
    # truncation, no alpha >= 1/255 cutoff, no 1e-4 transmittance early stop
    # (each is a genuine discontinuity of the CUDA semantics). The compiled
    # path always applies all three, like CUDA.
    smooth = tile <= 0
    rect_tile = 16 if smooth else tile
    rect_min, rect_max = tile_rect(mean2d, radius, width, height, rect_tile)
    tile = rect_tile

    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(height, dtype=jnp.float32)
    pixx, pixy = jnp.meshgrid(px, py, indexing="xy")  # [H, W]
    pixx = pixx.reshape(-1)
    pixy = pixy.reshape(-1)
    tilex = (pixx / tile).astype(jnp.int32)
    tiley = (pixy / tile).astype(jnp.int32)

    P = width * height

    def step(carry, g):
        T, done, C, D = carry
        m2d, dpt, con, col, op, rmin, rmax, vld = g
        dx = m2d[0] - pixx
        dy = m2d[1] - pixy
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        if smooth:
            live = (power <= 0.0) & vld
        else:
            in_rect = (
                (tilex >= rmin[0]) & (tilex < rmax[0]) & (tiley >= rmin[1]) & (tiley < rmax[1])
            )
            live = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_rect & vld
        alpha = jnp.where(live, alpha, 0.0)
        T_new = T * (1.0 - alpha)
        if smooth:
            ok = jnp.full_like(done, True)
        else:
            # CUDA rule: the Gaussian whose blend would push T below 1e-4 is
            # excluded AND sets the sticky `done` flag — everything after is
            # skipped even if its own test would pass.
            ok = (T_new >= T_EPS) & ~done
            done = done | (live & (T_new < T_EPS))
        w = jnp.where(ok, alpha * T, 0.0)
        C = C + w[:, None] * col[None, :]
        D = D + w * dpt
        T = jnp.where(ok, T_new, T)
        return (T, done, C, D), None

    T0 = jnp.ones((P,), dtype=jnp.float32)
    done0 = jnp.zeros((P,), dtype=bool)
    C0 = jnp.zeros((P, 3), dtype=jnp.float32)
    D0 = jnp.zeros((P,), dtype=jnp.float32)
    (T, _, C, D), _ = jax.lax.scan(
        step,
        (T0, done0, C0, D0),
        (mean2d, depth, conic, color, opac, rect_min, rect_max, valid),
    )

    out_color = C + T[:, None] * bg_color[None, :]
    img = out_color.T.reshape(3, height, width)
    dep = D.reshape(1, height, width)
    alp = (1.0 - T).reshape(1, height, width)
    return img, dep, alp
