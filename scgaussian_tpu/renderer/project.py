"""EWA projection of 3D Gaussians to screen space (pure XLA, differentiable).

Reproduces the semantics of the CUDA `preprocessCUDA` stage of
diff_gaussian_rasterization (called through `gaussian_renderer/__init__.py:
100-108`): frustum cull at view z <= 0.2, 3D covariance from quaternion+scale,
EWA 2D projection `Sigma' = J W Sigma W^T J^T` with the 0.3-pixel low-pass
dilation, conic + 3-sigma radius, NDC->pixel mapping, and clamped SH->RGB.

Everything is vectorized over the primitive axis N (no per-Gaussian control
flow) so XLA can tile it onto the VPU/MXU; culled Gaussians are masked, not
dropped, keeping shapes static.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from scgaussian_tpu.core import sh as sh_lib
from scgaussian_tpu.core.cameras import Camera

NEAR_CULL_Z = 0.2  # CUDA in_frustum near cull


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProjectedGaussians:
    """Screen-space per-Gaussian attributes (all [N, ...])."""

    mean2d: jnp.ndarray  # [N, 2] pixel coords (ndc2Pix convention)
    depth: jnp.ndarray  # [N] view-space z
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c) packed
    color: jnp.ndarray  # [N, 3] RGB from SH (or precomputed)
    opacity: jnp.ndarray  # [N] activated opacity in [0, 1]
    radius: jnp.ndarray  # [N] int32 pixel radius (0 => culled)
    valid: jnp.ndarray  # [N] bool (radius > 0)
    ext: jnp.ndarray  # [N, 2] int32 per-axis binning half-extents (<= radius)


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """CUDA ndc2Pix: ((v + 1) * S - 1) * 0.5."""
    return ((v + 1.0) * size - 1.0) * 0.5


def compute_cov3d(
    scaling: jnp.ndarray, rotation: jnp.ndarray, scaling_modifier: float = 1.0
) -> jnp.ndarray:
    """[N,3] activated scales + [N,4] quats -> packed [N,6] 3D covariance.

    Fully ELEMENTWISE expansion of Sigma = R S S^T R^T (same math as
    `transforms.covariance_from_scaling_rotation`, i.e. the reference's
    `build_covariance_from_scaling_rotation`, `scene/gaussian_model.py:37-41`):
    Sigma_ab = sum_j s_j^2 R_aj R_bj over [N] vectors. Batched [N,3,3]
    matmuls lower to a serialized small-matmul loop on TPU (measured ~5 ms at
    N=100k vs ~0.1 ms elementwise) and bf16 MXU passes lose precision the
    VPU keeps for free — fp32 elementwise is both faster and exact."""
    q = rotation / jnp.linalg.norm(rotation, axis=-1, keepdims=True)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # rows of R (matches transforms.quat_to_rotmat / `build_rotation`)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s = scaling_modifier * scaling
    s0, s1, s2 = s[:, 0] ** 2, s[:, 1] ** 2, s[:, 2] ** 2
    xx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    xy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    xz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    yy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    yz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    zz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def compute_cov2d(
    means3d: jnp.ndarray,
    cov3d_packed: jnp.ndarray,
    world_view: jnp.ndarray,
    focal_x: jnp.ndarray,
    focal_y: jnp.ndarray,
    tanfovx: jnp.ndarray,
    tanfovy: jnp.ndarray,
) -> jnp.ndarray:
    """EWA 2D covariance (a, b, c) with the 0.3 low-pass dilation.

    Mirrors CUDA computeCov2D: view-space point clamped to 1.3x the frustum
    tangent before building the Jacobian.
    """
    R = world_view[:3, :3]
    # ELEMENTWISE column combination instead of [N,3]x[3,3] matmul: exact
    # fp32 on the VPU (the CUDA reference is full fp32; TPU MXU fp32 passes
    # would need bf16_3x and still lower small-N matmuls poorly).
    t = (
        means3d[:, 0:1] * R[None, :, 0]
        + means3d[:, 1:2] * R[None, :, 1]
        + means3d[:, 2:3] * R[None, :, 2]
        + world_view[None, :3, 3]
    )
    # Degenerate-input safety: points at/behind the camera (e.g. dead
    # fixed-capacity slots) are culled by the near test, but 1/tz must stay
    # finite so their zero cotangents don't turn into NaNs in the backward.
    tz_raw = t[:, 2]
    tz = jnp.where(jnp.abs(tz_raw) < 1e-6, 1e-6, tz_raw)
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    txtz = t[:, 0] / tz
    tytz = t[:, 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    # J = [[fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]]
    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2

    # M = J @ R (rows of the 2x3 screen Jacobian in world coords)
    m0 = j00[:, None] * R[0] + j02[:, None] * R[2]  # [N, 3]
    m1 = j11[:, None] * R[1] + j12[:, None] * R[2]  # [N, 3]

    # quadratic forms m^T V m expanded elementwise over the packed symmetric
    # entries (exact fp32 on the VPU; see compute_cov3d's note on batched
    # small matmuls)
    vxx, vxy, vxz = cov3d_packed[:, 0], cov3d_packed[:, 1], cov3d_packed[:, 2]
    vyy, vyz, vzz = cov3d_packed[:, 3], cov3d_packed[:, 4], cov3d_packed[:, 5]

    def quad(u, w):  # u^T V w for [N, 3] vectors u, w
        return (
            vxx * u[:, 0] * w[:, 0]
            + vyy * u[:, 1] * w[:, 1]
            + vzz * u[:, 2] * w[:, 2]
            + vxy * (u[:, 0] * w[:, 1] + u[:, 1] * w[:, 0])
            + vxz * (u[:, 0] * w[:, 2] + u[:, 2] * w[:, 0])
            + vyz * (u[:, 1] * w[:, 2] + u[:, 2] * w[:, 1])
        )

    a = quad(m0, m0) + 0.3
    b = quad(m0, m1)
    c = quad(m1, m1) + 0.3
    return jnp.stack([a, b, c], axis=-1)


def sh_to_color(
    shs: jnp.ndarray,
    means3d: jnp.ndarray,
    campos: jnp.ndarray,
    active_sh_degree: int,
) -> jnp.ndarray:
    """Clamped SH->RGB per Gaussian with view direction from the camera.

    Matches CUDA computeColorFromSH / the python oracle path
    (`gaussian_renderer/__init__.py:79-83`): result = max(eval_sh + 0.5, 0).

    Args:
      shs: [N, K, 3] coefficient-major features (reference `get_features`
        layout, `scene/gaussian_model.py:134-142`).
    """
    dirs = means3d - campos[None, :]
    # safe normalize: a Gaussian exactly at the camera center (e.g. a dead
    # fixed-capacity slot parked at the origin) must not poison the batch
    # with NaNs — forward (0/0) OR backward (norm gradient at 0). The eps
    # bounds the backward amplification to ~1e6 so numerical-noise
    # cotangents on culled Gaussians cannot explode.
    dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-12)
    # basis-times-coefficients form: consumes the reference's [N, K, 3]
    # coefficient-major layout directly (no swapaxes — its backward
    # materializes a [N, K, 3] transposed copy, measured 2.3 ms at N=100k)
    k = sh_lib.num_sh_coeffs(active_sh_degree)
    basis = sh_lib.eval_sh_basis(active_sh_degree, dirs)  # [N, k]
    rgb = jnp.sum(basis[:, :, None] * shs[:, :k, :], axis=1) + 0.5
    return jnp.maximum(rgb, 0.0)


def project(
    camera: Camera,
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    active_sh_degree: int = 0,
    scaling_modifier: float = 1.0,
) -> ProjectedGaussians:
    """Project N Gaussians into screen space of `camera`.

    Culling (near plane, zero-det covariance, zero radius) is expressed as the
    `valid` mask / zero radius; all shapes stay [N].
    """
    W, H = camera.width, camera.height
    focal_x = W / (2.0 * camera.tanfovx)
    focal_y = H / (2.0 * camera.tanfovy)

    # elementwise column combinations (exact fp32 on the VPU; see
    # compute_cov3d's note on batched small matmuls)
    def xform(M):  # [N, 4] = [means3d, 1] @ M.T
        return (
            means3d[:, 0:1] * M[None, :, 0]
            + means3d[:, 1:2] * M[None, :, 1]
            + means3d[:, 2:3] * M[None, :, 2]
            + M[None, :, 3]
        )

    p_view = xform(camera.world_view)  # [N, 4]
    depth = p_view[:, 2]
    in_front = depth > NEAR_CULL_Z

    p_hom = xform(camera.full_proj)  # [N, 4]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]
    mean2d = jnp.stack([ndc2pix(p_proj[:, 0], W), ndc2pix(p_proj[:, 1], H)], axis=-1)

    if cov3d_precomp is None:
        assert scales is not None and rotations is not None
        cov3d_packed = compute_cov3d(scales, rotations, scaling_modifier)
    else:
        cov3d_packed = cov3d_precomp
    cov2d = compute_cov2d(
        means3d, cov3d_packed, camera.world_view, focal_x, focal_y,
        camera.tanfovx, camera.tanfovy,
    )

    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    sq = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + sq
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - sq)))
    radius = jnp.where(in_front & det_ok, radius_f, 0.0)
    # Radius participates in binning only — not a differentiable quantity.
    radius = jax.lax.stop_gradient(radius).astype(jnp.int32)

    # Exact-equivalence per-axis binning extents. CUDA's getRect duplicates
    # into a SQUARE of half-width radius = ceil(3 sigma_max), but any pixel
    # with q = d^T conic d > q_thr = 2 ln(255 op) has
    # alpha = op exp(-q/2) < 1/255 and is excluded by the rasterizer's
    # ALPHA_MIN test in forward AND backward — so tiles outside the
    # axis-aligned bbox of the {q <= q_thr} ellipse (half-extents
    # sqrt(q_thr * cov2d_ii); cov = conic^-1 is the dilated covariance whose
    # diagonal is (a, c)) contribute exactly zero. min() with the CUDA
    # radius keeps the rect never-larger than the reference's, making this a
    # pure entry cull with identical rendered output and gradients; the
    # 1e-4 relative margin + ceil absorb fp32 rounding vs the kernel's own
    # alpha evaluation. Cuts tile entries ~25-40% on realistic scenes, which
    # shrinks every [L]-scale binning op and the compositing kernels.
    opa = jax.lax.stop_gradient(opacities.reshape(-1))
    q_thr = 2.0 * jnp.log(jnp.maximum(255.0 * opa, 1e-12)) * (1.0 + 1e-4)
    q_thr = jnp.maximum(q_thr, 0.0)  # op <= 1/255: nothing can contribute
    # +1: getRect's max side is `trunc((m + r + tile-1)/tile)`, so a DROPPED
    # tile's nearest pixel only satisfies dx > r - 1; one pixel of slack
    # restores dx >= sqrt(q_thr * cov_ii) for every dropped pixel.
    ext_x = jnp.ceil(jnp.sqrt(q_thr * jnp.maximum(a, 0.0))) + 1.0
    ext_y = jnp.ceil(jnp.sqrt(q_thr * jnp.maximum(c, 0.0))) + 1.0
    ext = jnp.minimum(jnp.stack([ext_x, ext_y], axis=-1), radius_f[:, None])
    ext = jnp.where((in_front & det_ok)[:, None], ext, 0.0)
    ext = jax.lax.stop_gradient(ext).astype(jnp.int32)

    if colors_precomp is None:
        assert shs is not None
        color = sh_to_color(shs, means3d, camera.cam_center, active_sh_degree)
    else:
        color = colors_precomp

    valid = radius > 0
    return ProjectedGaussians(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        color=color,
        opacity=opacities.reshape(-1),
        radius=radius,
        valid=valid,
        ext=ext,
    )


def tile_rect(
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    width: int,
    height: int,
    tile: int,
    radius_y: jnp.ndarray | None = None,
):
    """Tile-grid bounding rect [min, max) per Gaussian (CUDA getRect).

    Returns (rect_min[N,2], rect_max[N,2]) int32 tile coords; empty rect
    (zero covered tiles) for culled Gaussians. `radius_y` makes the rect
    per-axis (the exact-equivalence extents from `project`); default is the
    CUDA square.
    """
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    r = radius.astype(jnp.float32)
    ry = r if radius_y is None else radius_y.astype(jnp.float32)
    # jnp float->int conversion truncates toward zero, same as the C cast in
    # getRect; the subsequent clip reproduces min(grid, max(0, .)).
    min_x = jnp.clip(((mean2d[:, 0] - r) / tile).astype(jnp.int32), 0, grid_x)
    min_y = jnp.clip(((mean2d[:, 1] - ry) / tile).astype(jnp.int32), 0, grid_y)
    max_x = jnp.clip(((mean2d[:, 0] + r + tile - 1) / tile).astype(jnp.int32), 0, grid_x)
    max_y = jnp.clip(((mean2d[:, 1] + ry + tile - 1) / tile).astype(jnp.int32), 0, grid_y)
    rect_min = jnp.stack([min_x, min_y], axis=-1)
    rect_max = jnp.stack([max_x, max_y], axis=-1)
    rect_min = jax.lax.stop_gradient(rect_min)
    rect_max = jax.lax.stop_gradient(rect_max)
    return rect_min, rect_max
