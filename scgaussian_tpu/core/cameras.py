"""Camera model and projection math.

A TPU-first redesign of the reference camera (`scene/cameras.py:19-86`,
`utils/graphics_utils.py:31-77`): the camera is a frozen pytree of jnp arrays
so it can be passed straight into jitted render/train steps. The reference
stores its view matrix TRANSPOSED (row-vector convention,
`scene/cameras.py:60-62`); here all matrices are plain row-major
column-vector maps (`x' = M @ x`) and the rasterizer consumes them directly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_ZNEAR = 0.01  # scene/cameras.py:55
DEFAULT_ZFAR = 100.0  # scene/cameras.py:54


def fov2focal(fov: float, pixels: float) -> float:
    """`utils/graphics_utils.py:73-74`."""
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    """`utils/graphics_utils.py:76-77`."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray = np.zeros(3),
    scale: float = 1.0,
) -> np.ndarray:
    """World->camera 4x4 (column-vector convention).

    Matches `getWorld2View2` (`utils/graphics_utils.py:38-49`): `R` is the
    camera-to-world rotation (COLMAP convention stored transposed) and `t`
    the world-to-camera translation; optional recentering of the camera
    position by (translate, scale).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    cam_center = (c2w[:3, 3] + translate) * scale
    c2w[:3, 3] = cam_center
    return np.linalg.inv(c2w).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective matrix (column-vector convention).

    Matches `getProjectionMatrix` (`utils/graphics_utils.py:51-71`): maps view
    z to w=z and clip z in [0, zfar*(z-znear)/(zfar-znear)].
    """
    tan_y = math.tan(fovy / 2.0)
    tan_x = math.tan(fovx / 2.0)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def intrinsic_matrix(fovx: float, fovy: float, width: int, height: int) -> np.ndarray:
    """Pinhole K with principal point at image center.

    Matches the reference's `intr` construction (`scene/cameras.py:65-67`).
    """
    fx = fov2focal(fovx, width)
    fy = fov2focal(fovy, height)
    K = np.array(
        [[fx, 0.0, width / 2.0], [0.0, fy, height / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    return K


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Device-ready camera pytree.

    Static metadata (image size, names) lives in `dataclasses.field(
    metadata=dict(static=True))` fields so jit treats them as compile-time
    constants; array leaves are traced.
    """

    # static
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    # traced leaves
    world_view: jnp.ndarray  # [4,4] world->camera, column-vector convention
    full_proj: jnp.ndarray  # [4,4] proj @ world_view
    cam_center: jnp.ndarray  # [3]
    K: jnp.ndarray  # [3,3] intrinsics
    tanfovx: jnp.ndarray  # scalar
    tanfovy: jnp.ndarray  # scalar
    znear: jnp.ndarray  # scalar
    zfar: jnp.ndarray  # scalar

    @staticmethod
    def create(
        R: np.ndarray,
        T: np.ndarray,
        fovx: float,
        fovy: float,
        width: int,
        height: int,
        znear: float = DEFAULT_ZNEAR,
        zfar: float = DEFAULT_ZFAR,
        translate: np.ndarray = np.zeros(3),
        scale: float = 1.0,
    ) -> "Camera":
        w2c = world_to_view(R, T, translate, scale)
        proj = projection_matrix(znear, zfar, fovx, fovy)
        full = (proj @ w2c).astype(np.float32)
        c2w = np.linalg.inv(w2c)
        return Camera(
            width=int(width),
            height=int(height),
            world_view=jnp.asarray(w2c),
            full_proj=jnp.asarray(full),
            cam_center=jnp.asarray(c2w[:3, 3].astype(np.float32)),
            K=jnp.asarray(intrinsic_matrix(fovx, fovy, width, height)),
            tanfovx=jnp.float32(math.tan(fovx / 2.0)),
            tanfovy=jnp.float32(math.tan(fovy / 2.0)),
            znear=jnp.float32(znear),
            zfar=jnp.float32(zfar),
        )
