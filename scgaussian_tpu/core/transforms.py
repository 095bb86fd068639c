"""Rotation / covariance / activation helpers for the Gaussian model.

Vectorized jnp counterparts of the reference's tensor builders
(`utils/general_utils.py:70-116`) and its activation set
(`scene/gaussian_model.py:36-51`). All functions take batched [N, ...]
arrays and are jit/vmap-friendly with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """logit; matches `utils/general_utils.py:19-20`."""
    return jnp.log(x / (1.0 - x))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion (w, x, y, z) -> rotation matrix.

    Matches `build_rotation` (`utils/general_utils.py:84-105`): the input is
    normalized internally.

    Args:
      q: [..., 4] quaternions in (r, x, y, z) order.
    Returns:
      [..., 3, 3]
    """
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / norm
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s); matches `utils/general_utils.py:107-116`.

    Args:
      s: [..., 3] scales (already activated, i.e. exp applied).
      q: [..., 4] quaternions.
    Returns:
      [..., 3, 3]
    """
    R = quat_to_rotmat(q)
    return R * s[..., None, :]  # R @ diag(s) scales columns of R


def covariance_from_scaling_rotation(
    scaling: jnp.ndarray, scaling_modifier: float, rotation: jnp.ndarray
) -> jnp.ndarray:
    """3D covariance Sigma = L L^T with L = R S.

    Matches `build_covariance_from_scaling_rotation`
    (`scene/gaussian_model.py:37-41`).

    Returns the full symmetric [..., 3, 3] matrix; use `strip_symmetric` for
    the packed 6-vector the reference passes to the rasterizer.
    """
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    # fp32 multiplies: covariance errors at TPU-default bf16 precision skew
    # the conic (anisotropic Gaussians especially) by ~1e-3 relative.
    return jnp.matmul(
        L, jnp.swapaxes(L, -1, -2), precision=jax.lax.Precision.HIGH
    )


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> packed upper-triangle 6-vector.

    Order (xx, xy, xz, yy, yz, zz) matches `strip_lowerdiag`
    (`utils/general_utils.py:70-79`).
    """
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_symmetric(six: jnp.ndarray) -> jnp.ndarray:
    """Packed 6-vector -> full symmetric [..., 3, 3] matrix."""
    xx, xy, xz, yy, yz, zz = (six[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / (n + eps)
