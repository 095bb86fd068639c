"""Hybrid Gaussian model state: ray-based foreground + free-xyz background.

TPU-first redesign of the reference `GaussianModel`
(`scene/gaussian_model.py:34-934`). The reference mutates Python attributes
and reallocates optimizer state on every densify event; here the model is a
frozen pytree with **fixed capacity + alive mask** so every training step and
every densify/prune maintenance step is a statically-shaped jitted program:

- foreground (ray) Gaussians: position is `xyz = rayo + rayd * zval`
  (`scene/gaussian_model.py:127`); only `zval` is optimized, `rayo/rayd`
  are fixed buffers. The fg set never grows or shrinks
  (`scene/gaussian_model.py:893,927`).
- background Gaussians: ordinary 3DGS parameters created only by
  densification (`scene/gaussian_model.py:844-858`), stored in a
  preallocated capacity `bg_capacity` with `bg_alive` mask; clone/split
  write into free slots, prune clears the mask.

Activations follow `scene/gaussian_model.py:36-51`: exp scaling, sigmoid
opacity, normalized-quaternion rotation. The active SH degree is a *traced*
integer: SH is always evaluated at max degree with coefficient bands above
the active degree masked to zero — identical results, no recompiles on
`oneupSHdegree` (`scene/gaussian_model.py:157-159`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scgaussian_tpu.core import transforms

# coefficient band sizes for SH degrees 1..3 within f_rest (15 coeffs at deg 3)
_SH_BANDS = [(0, 3, 1), (3, 8, 2), (8, 15, 3)]  # (start, end, required degree)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianParams:
    """Differentiable parameters. fg rows [Nr, ...], bg rows [Cb, ...].

    Feature layout matches the reference: f_dc [N, 1, 3], f_rest [N, K-1, 3]
    (`scene/gaussian_model.py:455-456`).
    """

    zval: jnp.ndarray  # [Nr, 1]
    f_dc: jnp.ndarray  # [Nr, 1, 3]
    f_rest: jnp.ndarray  # [Nr, K-1, 3]
    scaling: jnp.ndarray  # [Nr, 3] (log domain)
    rotation: jnp.ndarray  # [Nr, 4]
    opacity: jnp.ndarray  # [Nr, 1] (logit domain)
    bg_xyz: jnp.ndarray  # [Cb, 3]
    bg_f_dc: jnp.ndarray  # [Cb, 1, 3]
    bg_f_rest: jnp.ndarray  # [Cb, K-1, 3]
    bg_scaling: jnp.ndarray  # [Cb, 3]
    bg_rotation: jnp.ndarray  # [Cb, 4]
    bg_opacity: jnp.ndarray  # [Cb, 1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianModel:
    """Full model state = params + fixed buffers + densification stats."""

    params: GaussianParams
    rayo: jnp.ndarray  # [Nr, 3] fixed ray origins
    rayd: jnp.ndarray  # [Nr, 3] fixed ray directions
    bg_alive: jnp.ndarray  # [Cb] bool
    active_sh_degree: jnp.ndarray  # [] int32 (traced; masks SH bands)
    # densification statistics over the combined axis [Nr + Cb]
    xyz_gradient_accum: jnp.ndarray  # [N, 1]
    denom: jnp.ndarray  # [N, 1]
    max_radii2d: jnp.ndarray  # [N]
    # static metadata
    max_sh_degree: int = dataclasses.field(metadata=dict(static=True))
    spatial_lr_scale: float = dataclasses.field(metadata=dict(static=True))

    # ---------------- sizes ----------------
    @property
    def num_ray(self) -> int:
        return self.params.zval.shape[0]

    @property
    def bg_capacity(self) -> int:
        return self.params.bg_xyz.shape[0]

    @property
    def total(self) -> int:
        return self.num_ray + self.bg_capacity

    # ---------------- combined getters (reference property analogs) --------
    def get_xyz(self) -> jnp.ndarray:
        """`scene/gaussian_model.py:125-131`."""
        fg = self.rayo + self.rayd * self.params.zval
        return jnp.concatenate([fg, self.params.bg_xyz], axis=0)

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(
            jnp.concatenate([self.params.scaling, self.params.bg_scaling], axis=0)
        )

    def get_rotation(self) -> jnp.ndarray:
        rot = jnp.concatenate([self.params.rotation, self.params.bg_rotation], axis=0)
        return rot / (jnp.linalg.norm(rot, axis=-1, keepdims=True) + 1e-12)

    def get_opacity_raw(self) -> jnp.ndarray:
        """Sigmoid opacity WITHOUT the alive mask (reference `get_opacity`)."""
        op = jnp.concatenate([self.params.opacity, self.params.bg_opacity], axis=0)
        return jax.nn.sigmoid(op)

    def alive_mask(self) -> jnp.ndarray:
        return jnp.concatenate(
            [jnp.ones((self.num_ray,), bool), self.bg_alive], axis=0
        )

    def get_opacity(self) -> jnp.ndarray:
        """Activated opacity with dead bg slots forced to 0 (=> culled by the
        rasterizer's alpha >= 1/255 test; grads to dead slots vanish)."""
        return self.get_opacity_raw() * self.alive_mask()[:, None]

    def get_features(self) -> jnp.ndarray:
        """[N, K, 3] with SH bands above active_sh_degree zeroed.

        Evaluating masked max-degree SH == evaluating at active degree, so
        `oneupSHdegree` is a traced integer bump, not a recompile.
        """
        f_dc = jnp.concatenate([self.params.f_dc, self.params.bg_f_dc], axis=0)
        f_rest = jnp.concatenate([self.params.f_rest, self.params.bg_f_rest], axis=0)
        deg = self.active_sh_degree
        if f_rest.shape[1] > 0:
            band = np.zeros((f_rest.shape[1],), dtype=np.int32)
            for s, e, d in _SH_BANDS:
                band[s:e] = d
            keep = (jnp.asarray(band)[None, :, None] <= deg).astype(f_rest.dtype)
            f_rest = f_rest * keep
        return jnp.concatenate([f_dc, f_rest], axis=1)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        """Packed [N, 6] covariance (`scene/gaussian_model.py:154-155`)."""
        cov = transforms.covariance_from_scaling_rotation(
            self.get_scaling(), scaling_modifier, self.get_rotation()
        )
        return transforms.strip_symmetric(cov)

    def oneup_sh_degree(self) -> "GaussianModel":
        """`scene/gaussian_model.py:157-159`."""
        return dataclasses.replace(
            self,
            active_sh_degree=jnp.minimum(
                self.active_sh_degree + 1, self.max_sh_degree
            ),
        )


def create_model(
    rayo: np.ndarray,
    rayd: np.ndarray,
    zval: np.ndarray,
    colors: np.ndarray,
    max_sh_degree: int,
    spatial_lr_scale: float,
    bg_capacity: int = 65536,
    initial_opacity: float = 0.1,
) -> GaussianModel:
    """Build the hybrid model from promoted match points.

    Mirrors `create_from_pcd` (`scene/gaussian_model.py:362-468`): SH DC from
    warped match colors, log-scale from 3-NN mean squared distance
    (distCUDA2 -> knn_mean_sq_dist), identity rotations, opacity 0.1, empty
    background set.
    """
    from scgaussian_tpu.model.knn import knn_mean_sq_dist

    nr = zval.shape[0]
    k_coeffs = (max_sh_degree + 1) ** 2

    points = jnp.asarray(rayo + rayd * zval.reshape(-1, 1), jnp.float32)
    dist2 = jnp.maximum(knn_mean_sq_dist(points, 3), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    from scgaussian_tpu.core.sh import rgb_to_sh

    f_dc = rgb_to_sh(jnp.asarray(colors, jnp.float32))[:, None, :]  # [Nr, 1, 3]
    f_rest = jnp.zeros((nr, k_coeffs - 1, 3), jnp.float32)
    rots = jnp.zeros((nr, 4), jnp.float32).at[:, 0].set(1.0)
    opac = transforms.inverse_sigmoid(
        jnp.full((nr, 1), initial_opacity, jnp.float32)
    )

    cb = bg_capacity
    params = GaussianParams(
        zval=jnp.asarray(zval.reshape(-1, 1), jnp.float32),
        f_dc=f_dc,
        f_rest=f_rest,
        scaling=scales,
        rotation=rots,
        opacity=opac,
        bg_xyz=jnp.zeros((cb, 3), jnp.float32),
        bg_f_dc=jnp.zeros((cb, 1, 3), jnp.float32),
        bg_f_rest=jnp.zeros((cb, k_coeffs - 1, 3), jnp.float32),
        bg_scaling=jnp.full((cb, 3), -10.0, jnp.float32),
        bg_rotation=jnp.zeros((cb, 4), jnp.float32).at[:, 0].set(1.0),
        bg_opacity=jnp.full((cb, 1), -10.0, jnp.float32),
    )
    n = nr + cb
    return GaussianModel(
        params=params,
        rayo=jnp.asarray(rayo, jnp.float32),
        rayd=jnp.asarray(rayd, jnp.float32),
        bg_alive=jnp.zeros((cb,), bool),
        active_sh_degree=jnp.int32(0),
        xyz_gradient_accum=jnp.zeros((n, 1), jnp.float32),
        denom=jnp.zeros((n, 1), jnp.float32),
        max_radii2d=jnp.zeros((n,), jnp.float32),
        max_sh_degree=max_sh_degree,
        spatial_lr_scale=float(spatial_lr_scale),
    )
