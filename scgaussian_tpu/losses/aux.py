"""Auxiliary depth-regularization losses from the reference's loss library.

The reference ships (but never wires into training) an edge-aware smoothness
loss, patch-normalized depth losses, and a virtual-view warp-consistency
loss (`utils/loss_utils.py:19-38,96-159,208-246`). They are part of the
public surface a user migrating experiments may call, so they are provided
here with the same semantics, redesigned for XLA: boolean fancy-indexing
becomes masked means (static shapes), `F.unfold` becomes a reshape/transpose
(stride == kernel, so patches are a pure relayout), and the Python
`random.sample` inside `ranking_loss` becomes an explicit JAX key.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from scgaussian_tpu.losses.image import avgpool_ssim_map
from scgaussian_tpu.losses.sampling import grid_sample_2d


def get_smooth_loss(depth: jnp.ndarray, guide: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Edge-aware first-order depth smoothness (`utils/loss_utils.py:19-38`).

    Args:
      depth: [H, W].
      guide: optional [H, W] or [C, H, W] guidance image; depth gradients are
        attenuated by exp(-|grad(guide)|).
    """
    gx = jnp.abs(depth[:, :-1] - depth[:, 1:])
    gy = jnp.abs(depth[:-1, :] - depth[1:, :])
    if guide is None:
        wx = jnp.ones_like(gx)
        wy = jnp.ones_like(gy)
    else:
        if guide.ndim == 3:
            ix = jnp.mean(jnp.abs(guide[:, :, :-1] - guide[:, :, 1:]), axis=0)
            iy = jnp.mean(jnp.abs(guide[:, :-1, :] - guide[:, 1:, :]), axis=0)
        else:
            ix = jnp.abs(guide[:, :-1] - guide[:, 1:])
            iy = jnp.abs(guide[:-1, :] - guide[1:, :])
        wx = jnp.exp(-ix)
        wy = jnp.exp(-iy)
    return jnp.mean(gx * wx) + jnp.mean(gy * wy)


def patchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, 1, H, W] -> [B * (H/p) * (W/p), p*p] non-overlapping patches.

    Matches `F.unfold(kernel_size=p, stride=p)` + permute/view
    (`utils/loss_utils.py:110-112`): patches enumerate row-major over the
    patch grid; elements within a patch are row-major.
    """
    b, c, h, w = x.shape
    assert c == 1, "reference patchify is single-channel"
    p = patch_size
    x = x[:, 0, : h - h % p, : w - w % p]
    x = x.reshape(b, h // p, p, w // p, p)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(-1, p * p)


def _normalize_patches(x: jnp.ndarray) -> jnp.ndarray:
    """Per-patch standardization with a global-std floor
    (`utils/loss_utils.py:105-108`); std is the unbiased (ddof=1) torch.std."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    std = jnp.std(x, axis=1, keepdims=True, ddof=1)
    return (x - mean) / (std + 1e-2 * jnp.std(x.reshape(-1), ddof=1))


def margin_l2_loss(
    output: jnp.ndarray,
    gt: jnp.ndarray,
    patch_mask: jnp.ndarray,
    margin: float,
    return_mask: bool = False,
):
    """Squared error over elements of selected patches whose |error| exceeds
    `margin` (`utils/loss_utils.py:96-103`), as a masked mean (static shapes
    instead of boolean indexing)."""
    err = output - gt
    sel = patch_mask[:, None] & (jnp.abs(err) > margin)
    w = sel.astype(err.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    loss = jnp.sum(err * err * w) / denom
    if return_mask:
        return loss, sel
    return loss


def patch_norm_mse_loss(
    input_depth: jnp.ndarray,
    target_depth: jnp.ndarray,
    fore_mask: jnp.ndarray,
    patch_size: int,
    margin: float = 0.2,
    return_mask: bool = False,
):
    """Patch-normalized depth MSE on mostly-foreground patches
    (`utils/loss_utils.py:114-118`). Inputs are [B, 1, H, W]; a patch
    participates iff fewer than p*p/3 of its pixels are masked."""
    ip = _normalize_patches(patchify(input_depth, patch_size))
    tp = _normalize_patches(patchify(target_depth, patch_size))
    mask_patches = (
        jnp.sum(patchify(fore_mask, patch_size), axis=1) < patch_size * patch_size / 3
    )
    return margin_l2_loss(ip, tp, mask_patches, margin, return_mask)


def ranking_loss(
    input_depth: jnp.ndarray,
    target_depth: jnp.ndarray,
    patch_size: int,
    margin: float = 1e-4,
    rng: Optional[jax.Array] = None,
    sample_idx: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Depth-ordering hinge on random pixel pairs within each patch
    (`utils/loss_utils.py:121-140`): sample 6 in-patch positions forming 3
    pairs; penalize pairs whose predicted ordering disagrees with the target
    (hinge at `margin`). The reference draws indices with `random.sample`;
    pass `rng` (or explicit `sample_idx` [6]) instead."""
    ip = patchify(input_depth, patch_size)
    tp = patchify(target_depth, patch_size)
    if sample_idx is None:
        if rng is None:
            raise ValueError("ranking_loss needs rng or sample_idx")
        sample_idx = jax.random.choice(
            rng, ip.shape[1], shape=(6,), replace=False
        )
    ipx = ip[:, sample_idx].reshape(-1, 2)
    tpx = tp[:, sample_idx].reshape(-1, 2)
    g = tpx[:, 0] - tpx[:, 1]
    t = ipx[:, 0] - ipx[:, 1]
    t = jnp.where(g < 0, t, -t) + margin
    pos = (t > 0).astype(t.dtype)
    return jnp.sum(t * pos) / jnp.maximum(jnp.sum(pos), 1.0)


def cons_loss(
    input_depth: jnp.ndarray,
    target_depth: jnp.ndarray,
    patch_size: int,
    margin: float = 1e-4,
) -> jnp.ndarray:
    """Local depth-consistency hinge (`utils/loss_utils.py:142-159`): for each
    pixel, its 2 nearest neighbours *in target-depth value* within the patch
    must stay within `margin` in predicted depth (only when the target gap
    itself is < 0.01).

    Reference quirk kept: the diagonal mask there is dead code
    (`tmp[tmp1>1] = 1e5` with `tmp1` a 0/1 identity — `>1` never holds), so
    each pixel's own zero distance IS eligible as a "nearest neighbour"."""
    ip = patchify(input_depth, patch_size)
    tp = patchify(target_depth, patch_size)
    tmp = jnp.abs(tp[:, :, None] - tp[:, None, :])
    order = jnp.argsort(tmp, axis=-1)[:, :, :2]
    tmp_t = jnp.take_along_axis(tmp, order, axis=-1)
    t = jnp.abs(ip[:, :, None] - ip[:, None, :])
    t = jnp.take_along_axis(t, order, axis=-1) - margin
    sel = ((t > 0) & (tmp_t < 0.01)).astype(t.dtype)
    return jnp.sum(t * sel) / jnp.maximum(jnp.sum(sel), 1.0)


def get_virtual_warp_loss(
    virtual_img: jnp.ndarray,  # [3, H, W] render from the virtual pose
    virtual_depth: jnp.ndarray,  # [H, W] (or [1, H, W]) rendered depth
    vir_c2w: jnp.ndarray,  # [3, 4] or [4, 4] virtual camera-to-world
    intrs: jnp.ndarray,  # [V, 4, 4] (or [V, 3, 3]) train intrinsics
    w2cs: jnp.ndarray,  # [V, 4, 4] train world-to-camera
    img_colors: jnp.ndarray,  # [V, 3, H, W] train images
    vir_mask: jnp.ndarray,  # [H, W] (or [1, H, W]) validity mask
) -> jnp.ndarray:
    """Virtual-view warp consistency (`utils/loss_utils.py:208-246`):
    back-project the virtual render's depth, reproject into every training
    view, warp the training images to the virtual view, and take the
    per-pixel minimum avgpool-SSIM error across views (out-of-frustum
    pixels excluded; fully-invisible or masked pixels contribute 0). The
    reference computes an L1 map too but discards it — replicated by
    omission."""
    _, h, w = virtual_img.shape
    depth = virtual_depth.reshape(-1)
    mask0 = vir_mask.reshape(h, w)

    py, px = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pix = jnp.stack(
        [px.reshape(-1).astype(depth.dtype), py.reshape(-1).astype(depth.dtype),
         jnp.ones((h * w,), depth.dtype)]
    )  # [3, P]
    K0 = intrs[0][:3, :3]
    cam_pts = jnp.matmul(
        jnp.linalg.inv(K0), pix * depth[None], precision=jax.lax.Precision.HIGHEST
    )
    c2w = jnp.eye(4, dtype=depth.dtype)
    c2w = c2w.at[:3, :4].set(jnp.asarray(vir_c2w)[:3, :4])
    world = jnp.matmul(
        c2w, jnp.concatenate([cam_pts, jnp.ones_like(cam_pts[:1])]),
        precision=jax.lax.Precision.HIGHEST,
    )  # [4, P]

    def per_view(w2c, K, colors):
        cam = jnp.matmul(w2c, world, precision=jax.lax.Precision.HIGHEST)[:3]
        xyz = jnp.matmul(K[:3, :3], cam, precision=jax.lax.Precision.HIGHEST)
        xy = xyz[:2] / (xyz[2:] + 1e-8)
        nx = 2.0 * xy[0] / (w - 1) - 1.0
        ny = 2.0 * xy[1] / (h - 1) - 1.0
        in_bounds = (jnp.abs(nx) <= 1.0) & (jnp.abs(ny) <= 1.0)
        warp = grid_sample_2d(colors, jnp.stack([nx, ny], axis=-1)).reshape(3, h, w)
        err = jnp.mean(avgpool_ssim_map(virtual_img, warp), axis=0)
        return jnp.where(in_bounds.reshape(h, w), err, 1000.0)

    errs = jax.vmap(per_view)(w2cs, intrs, img_colors)  # [V, H, W]
    best = jnp.min(errs, axis=0)
    best = jnp.where((best >= 1000.0) | ~mask0.astype(bool), 0.0, best)
    return jnp.mean(best)
