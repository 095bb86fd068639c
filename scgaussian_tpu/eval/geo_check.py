"""Multi-view depth reprojection consistency filter (geo_check).

Rebuilds `utils/geo_check.py:33-127` (dead code in the reference but part of
its public utility surface, and the standalone spec of the depth-fusion op
behind `get_matchloss_from_renderdepth`). TPU-native redesign: the per-view
Python loops become a vmap over (ref, src) pairs of one jitted pairwise
kernel; `cv2.remap` becomes the shared bilinear sampler (zero border, same
INTER_LINEAR semantics).

Reference quirks kept:
- the `extrinsics` argument is *named* c2ws upstream but used as
  world->camera maps (`xyz_src = E_src @ inv(E_ref) @ xyz_ref`);
- with fewer than `num_select+1` cameras the pair table simply truncates,
  so a view's own index can appear among its "sources" (argsort of the
  1e3-filled diagonal);
- the averaged depth divides by (#consistent + 1) counting the reference
  view itself, and the final mask needs strictly more than `view_thresh`
  consistent sources.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scgaussian_tpu.losses.sampling import bilinear_sample_pix

_HI = jax.lax.Precision.HIGHEST


def get_pairs(extrinsics: np.ndarray, num_select: int = 10) -> np.ndarray:
    """Nearest cameras by translation distance (`utils/geo_check.py:25-31`);
    the diagonal is pushed to 1e3 so self sorts (almost) last."""
    t = extrinsics[:, :3, 3]
    dists = np.linalg.norm(t[:, None] - t[None, :], axis=-1)
    dists[np.eye(dists.shape[0]) > 0] = 1e3
    return np.argsort(dists, axis=1)[:, :num_select]


def reproject_with_depth(
    depth_ref: jnp.ndarray,  # [H, W]
    intr_ref: jnp.ndarray,  # [3, 3] (or [4, 4])
    extr_ref: jnp.ndarray,  # [4, 4] world->cam
    depth_src: jnp.ndarray,
    intr_src: jnp.ndarray,
    extr_src: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project ref pixels into src with ref depth, resample src depth there,
    and project back (`utils/geo_check.py:91-127`). Returns
    (depth_reprojected, x2d_reprojected, y2d_reprojected, x2d_src, y2d_src),
    each [H, W]."""
    h, w = depth_ref.shape
    K_ref = intr_ref[:3, :3]
    K_src = intr_src[:3, :3]

    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pix = jnp.stack(
        [xx.reshape(-1), yy.reshape(-1), jnp.ones((h * w,))],
    ).astype(depth_ref.dtype)  # [3, P]

    xyz_ref = jnp.matmul(
        jnp.linalg.inv(K_ref), pix * depth_ref.reshape(1, -1), precision=_HI
    )
    ref_to_src = jnp.matmul(extr_src, jnp.linalg.inv(extr_ref), precision=_HI)
    xyz_src = jnp.matmul(
        ref_to_src, jnp.concatenate([xyz_ref, jnp.ones_like(xyz_ref[:1])]),
        precision=_HI,
    )[:3]
    K_xyz_src = jnp.matmul(K_src, xyz_src, precision=_HI)
    xy_src = K_xyz_src[:2] / K_xyz_src[2:3]

    sampled = bilinear_sample_pix(depth_src[None], xy_src[0], xy_src[1])[0]

    xyz_src2 = jnp.matmul(
        jnp.linalg.inv(K_src),
        jnp.concatenate([xy_src, jnp.ones_like(xy_src[:1])]) * sampled[None],
        precision=_HI,
    )
    src_to_ref = jnp.matmul(extr_ref, jnp.linalg.inv(extr_src), precision=_HI)
    xyz_rep = jnp.matmul(
        src_to_ref, jnp.concatenate([xyz_src2, jnp.ones_like(xyz_src2[:1])]),
        precision=_HI,
    )[:3]
    depth_rep = xyz_rep[2].reshape(h, w)
    K_xyz_rep = jnp.matmul(K_ref, xyz_rep, precision=_HI)
    xy_rep = K_xyz_rep[:2] / K_xyz_rep[2:3]
    return (
        depth_rep,
        xy_rep[0].reshape(h, w),
        xy_rep[1].reshape(h, w),
        xy_src[0].reshape(h, w),
        xy_src[1].reshape(h, w),
    )


@functools.partial(jax.jit, static_argnames=("dist_thresh", "depth_thresh"))
def _pairwise_consistency(
    depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src,
    dist_thresh: float, depth_thresh: float,
):
    h, w = depth_ref.shape
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    depth_rep, x_rep, y_rep, _, _ = reproject_with_depth(
        depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src
    )
    dist = jnp.sqrt((x_rep - xx) ** 2 + (y_rep - yy) ** 2)
    rel = jnp.abs(depth_rep - depth_ref) / depth_ref
    mask = (dist < dist_thresh) & (rel < depth_thresh)
    return jnp.where(mask, depth_rep, 0.0), mask


def geocheck(
    intrs: np.ndarray,  # [V, 3, 3] or [V, 4, 4]
    extrinsics: np.ndarray,  # [V, 4, 4] world->cam (named c2ws upstream)
    depths: np.ndarray,  # [V, H, W]
    dist_thresh: float = 1.0,
    depth_thresh: float = 0.01,
    view_thresh: int = 5,
    num_select: int = 15,
) -> Tuple[np.ndarray, np.ndarray]:
    """Geometric consistency fusion (`utils/geo_check.py:33-88`): a ref pixel
    is kept iff > `view_thresh` source views agree (reprojection < 1 px and
    relative depth gap < 1%); kept depths are averaged over agreeing views
    plus the reference. Returns (filtered_depths [V,H,W], masks [V,H,W])."""
    intrs = jnp.asarray(intrs, jnp.float32)
    extrs = jnp.asarray(extrinsics, jnp.float32)
    depths_j = jnp.asarray(depths, jnp.float32)
    pairs = get_pairs(np.asarray(extrinsics), num_select)

    pair_fn = jax.vmap(
        lambda j, i: _pairwise_consistency(
            depths_j[i], intrs[i], extrs[i], depths_j[j], intrs[j], extrs[j],
            dist_thresh=dist_thresh, depth_thresh=depth_thresh,
        )
    )

    out_depths, out_masks = [], []
    for i in range(depths.shape[0]):
        rep, masks = pair_fn(jnp.asarray(pairs[i]), jnp.full((pairs.shape[1],), i))
        count = jnp.sum(masks.astype(jnp.int32), axis=0)
        avg = (jnp.sum(rep, axis=0) + depths_j[i]) / (count + 1)
        final_mask = count > view_thresh
        out_depths.append(np.asarray(avg * final_mask.astype(jnp.float32)))
        out_masks.append(np.asarray(final_mask))
    return np.stack(out_depths), np.stack(out_masks).astype(np.float32)


def visualize_depth(depth: np.ndarray, minmax=None):
    """JET-colormapped depth PIL image (`utils/geo_check.py:7-22`)."""
    import cv2
    from PIL import Image

    x = np.nan_to_num(np.asarray(depth))
    if minmax is None:
        mi = np.min(x[x > 0]) if np.any(x > 0) else 0.0
        ma = np.max(x)
    else:
        mi, ma = minmax
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * x).astype(np.uint8)
    return Image.fromarray(cv2.applyColorMap(x, cv2.COLORMAP_JET))
