"""Match-prior machinery: ray bundles, reprojection losses, init-stage loop.

TPU-first redesign of the reference's per-view-pair Python dicts
(`scene/gaussian_model.py:284-360` `create_from_mono`,
`:175-239` `get_matchloss_from_base`, `:241-282`
`get_matchloss_from_renderdepth`) and the init-stage driver loop
(`train.py:49-97`). The dict-of-dicts of variable-length match tensors
becomes ONE padded pytree over the ordered-pair axis [P = V*(V-1), M], so
the whole init stage is a single `lax.scan` over 2000 Adam steps — one
compile, no host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scgaussian_tpu.losses.sampling import grid_sample_2d
from scgaussian_tpu.train import optim


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MatchBundle:
    """Padded per-ordered-pair match data. Pair p = (src[p] -> dst[p]);
    `partner[p]` is the index of the reversed pair (dst -> src). Row k of
    pair p and row k of its partner are the two endpoints of one match."""

    rays_o: jnp.ndarray  # [P, M, 3] world ray origins (camera centers)
    rays_d: jnp.ndarray  # [P, M, 3] world unit ray directions
    cam_rays_d: jnp.ndarray  # [P, M, 3] ray dirs in the source camera frame
    uv: jnp.ndarray  # [P, M, 2] match pixel coords in the source view
    color: jnp.ndarray  # [P, M, 3] source image bilinearly warped to uv
    mask: jnp.ndarray  # [P, M] warp mask (blender mask; 0 on padding)
    pad_valid: jnp.ndarray  # [P, M] bool: True for real (non-padding) matches
    near_far: jnp.ndarray  # [P, 2]
    src: jnp.ndarray  # [P] int32
    dst: jnp.ndarray  # [P] int32
    partner: jnp.ndarray  # [P] int32
    pairs_of_view: jnp.ndarray  # [V, V-1] int32: ordered pairs with src == v
    intr: jnp.ndarray  # [V, 3, 3]
    w2c: jnp.ndarray  # [V, 4, 4]
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_pairs(self) -> int:
        return self.rays_o.shape[0]

    @property
    def matches_per_pair(self) -> int:
        return self.rays_o.shape[1]


def build_match_bundle(
    images: List[np.ndarray],  # V x [H, W, 3] float in [0, 1]
    intrs: List[np.ndarray],  # V x [3, 3]
    w2cs: List[np.ndarray],  # V x [4, 4]
    near_fars: List[np.ndarray],  # V x [2]
    match_pixels: Dict[Tuple[int, int], np.ndarray],  # (i, j) -> [m, 2] in [0,1]
    blender_masks: List[np.ndarray] | None = None,  # V x [H, W] or None
) -> MatchBundle:
    """Host-side construction, mirroring `create_from_mono`
    (`scene/gaussian_model.py:284-360`): normalized match pixels -> pixel
    rays via K^-1 then rotation by w2c^-1; colors/masks warped by bilinear
    grid_sample; matches padded to the per-pair maximum."""
    V = len(images)
    H, W = images[0].shape[:2]
    pairs = [(i, j) for i in range(V) for j in range(V) if j != i]
    pair_index = {p: k for k, p in enumerate(pairs)}
    M = max(1, max(m.shape[0] for m in match_pixels.values()))

    P = len(pairs)
    rays_o = np.zeros((P, M, 3), np.float32)
    rays_d = np.zeros((P, M, 3), np.float32)
    cam_rays_d = np.zeros((P, M, 3), np.float32)
    uv = np.zeros((P, M, 2), np.float32)
    color = np.zeros((P, M, 3), np.float32)
    mask = np.zeros((P, M), np.float32)
    pad_valid = np.zeros((P, M), bool)
    near_far = np.zeros((P, 2), np.float32)

    for k, (i, j) in enumerate(pairs):
        mp = match_pixels[(i, j)].astype(np.float32)  # [m, 2] normalized
        m = mp.shape[0]
        px = mp[:, 0] * W
        py = mp[:, 1] * H
        uv[k, :m] = np.stack([px, py], axis=-1)

        img = jnp.asarray(images[i].transpose(2, 0, 1), jnp.float32)
        grid = jnp.asarray(mp * 2.0 - 1.0)
        color[k, :m] = np.asarray(grid_sample_2d(img, grid)).T

        if blender_masks is not None and blender_masks[i] is not None:
            bm = jnp.asarray(blender_masks[i][None], jnp.float32)
            warp_m = np.asarray(grid_sample_2d(bm, grid))[0]
        else:
            warp_m = np.ones((m,), np.float32)
        mask[k, :m] = warp_m
        pad_valid[k, :m] = True

        K = intrs[i]
        w2c = w2cs[i]
        c2w = np.linalg.inv(w2c)
        homo = np.stack([px, py, np.ones_like(px)], axis=-1)  # [m, 3]
        p_cam = homo @ np.linalg.inv(K).T
        d_cam = p_cam / (np.linalg.norm(p_cam, axis=-1, keepdims=True) + 1e-8)
        d_world = d_cam @ c2w[:3, :3].T
        rays_d[k, :m] = d_world
        rays_o[k, :m] = c2w[:3, 3][None, :]
        cam_rays_d[k, :m] = d_world @ w2c[:3, :3].T
        near_far[k] = near_fars[i]

    partner = np.array([pair_index[(j, i)] for (i, j) in pairs], np.int32)
    src = np.array([i for (i, j) in pairs], np.int32)
    dst = np.array([j for (i, j) in pairs], np.int32)
    pov = np.array(
        [[pair_index[(i, j)] for j in range(V) if j != i] for i in range(V)], np.int32
    )

    return MatchBundle(
        rays_o=jnp.asarray(rays_o),
        rays_d=jnp.asarray(rays_d),
        cam_rays_d=jnp.asarray(cam_rays_d),
        uv=jnp.asarray(uv),
        color=jnp.asarray(color),
        mask=jnp.asarray(mask),
        pad_valid=jnp.asarray(pad_valid),
        near_far=jnp.asarray(near_far),
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        partner=jnp.asarray(partner),
        pairs_of_view=jnp.asarray(pov),
        intr=jnp.asarray(np.stack(intrs).astype(np.float32)),
        w2c=jnp.asarray(np.stack(w2cs).astype(np.float32)),
        width=W,
        height=H,
    )


def init_zvals(bundle: MatchBundle, rng: jax.Array) -> jnp.ndarray:
    """z ~ U(near, far) per match (`scene/gaussian_model.py:339-340`)."""
    P, M = bundle.mask.shape
    u = jax.random.uniform(rng, (P, M))
    near = bundle.near_far[:, 0:1]
    far = bundle.near_far[:, 1:2]
    return u * (far - near) + near


def _project_to_view(bundle: MatchBundle, world_pts: jnp.ndarray, view: jnp.ndarray):
    """world_pts [..., M, 3] -> pixel xy + depth in `view` (w2c then K)."""
    w2c = bundle.w2c[view]  # [..., 4, 4]
    K = bundle.intr[view]
    # HIGHEST: bf16-default einsum error (~1e-3) is visible in normalized
    # pixel reprojection residuals that the match loss regresses to ~1e-3.
    cam = jnp.einsum(
        "...ij,...mj->...mi", w2c[..., :3, :3], world_pts,
        precision=jax.lax.Precision.HIGHEST,
    ) + w2c[..., None, :3, 3]
    xyz = jnp.einsum("...ij,...mj->...mi", K, cam, precision=jax.lax.Precision.HIGHEST)
    xy = xyz[..., :2] / (xyz[..., 2:3] + 1e-8)
    return xy, xyz[..., 2]


def matchloss_from_base(
    zvals: jnp.ndarray, bundle: MatchBundle
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric cross-view reprojection error of matched ray points.

    Matches `get_matchloss_from_base` (`scene/gaussian_model.py:175-239`):
    per ordered pair, lift matched rays at current z, project into the
    partner view, compare to the partner's match UVs normalized by (W, H);
    the loss sums the masked means of both directions of every unordered
    pair == the masked mean over every ordered pair.

    Returns (total_loss, per_match_error [P, M]).
    """
    world = bundle.rays_o + bundle.rays_d * zvals[..., None]  # [P, M, 3]
    xy, _ = _project_to_view(bundle, world, bundle.dst)
    uv_partner = bundle.uv[bundle.partner]  # [P, M, 2]
    wh = jnp.asarray([bundle.width, bundle.height], jnp.float32)
    err = jnp.mean(jnp.abs(xy - uv_partner) / wh, axis=-1)  # [P, M]

    valid = (bundle.mask * bundle.mask[bundle.partner]) > 0
    num = jnp.sum(jnp.where(valid, err, 0.0), axis=1)
    den = jnp.maximum(jnp.sum(valid, axis=1), 1)
    loss = jnp.sum(num / den)
    return loss, err


def matchloss_from_renderdepth(
    bundle: MatchBundle, view: jnp.ndarray, depth_map: jnp.ndarray
) -> jnp.ndarray:
    """Structure-consistency loss on rendered depth.

    Matches `get_matchloss_from_renderdepth` (`scene/gaussian_model.py:
    241-282`): bilinearly sample the rendered depth of `view` at its match
    UVs, lift to 3D along the stored rays (z = depth / cam_ray_z), reproject
    into each partner view, L1 to the partner UVs (normalized), averaged
    over in-bounds & mask-valid matches, summed over this view's pairs.

    depth_map: [1, H, W] (rasterizer depth output).
    """
    pair_ids = bundle.pairs_of_view[view]  # [V-1]
    uv = bundle.uv[pair_ids]  # [V-1, M, 2]
    wh = jnp.asarray([bundle.width, bundle.height], jnp.float32)

    norm = uv / wh * 2.0 - 1.0
    flat = norm.reshape(-1, 2)
    d = grid_sample_2d(depth_map, flat)[0].reshape(uv.shape[:2])  # [V-1, M]

    cam_rays_d = bundle.cam_rays_d[pair_ids]
    # safe divide: padded rows have zero rays; they carry zero weight below,
    # but inf/NaN would still poison gradients through the masked product.
    czd = cam_rays_d[..., 2]
    z = d / jnp.where(jnp.abs(czd) > 1e-8, czd, 1.0)
    world = bundle.rays_o[pair_ids] + bundle.rays_d[pair_ids] * z[..., None]

    xy, _ = _project_to_view(bundle, world, bundle.dst[pair_ids])
    in_bounds = (
        (xy[..., 0] > 0)
        & (xy[..., 0] < bundle.width)
        & (xy[..., 1] > 0)
        & (xy[..., 1] < bundle.height)
    )
    uv_partner = bundle.uv[bundle.partner[pair_ids]]
    err = jnp.mean(jnp.abs(xy - uv_partner) / wh, axis=-1)  # [V-1, M]

    valid = (bundle.mask[pair_ids] * bundle.mask[bundle.partner[pair_ids]]) > 0
    w = (in_bounds & valid).astype(jnp.float32)
    per_pair = jnp.sum(err * w, axis=1) / (jnp.sum(w, axis=1) + 1e-8)
    return jnp.sum(per_pair)


@dataclasses.dataclass(frozen=True)
class InitStageResult:
    best_z: jnp.ndarray  # [P, M]
    min_err: jnp.ndarray  # [P, M]
    final_loss: jnp.ndarray  # []


def run_init_stage(
    bundle: MatchBundle,
    z0: jnp.ndarray,
    iterations: int = 2000,
    base_lr: float = 0.5,
    lr_drop_iters: Tuple[int, ...] = (500, 1000, 1500),
    loss_scale: float = 5.0,
) -> InitStageResult:
    """The full match-prior z optimization as one scanned program.

    Matches `train.py:49-97`: Adam(lr 0.5, eps 1e-15) over z, lr halved at
    500/1000/1500, loss = 5 * matchloss, per-match best-z tracked under the
    running minimum reprojection error *before* each step.
    """
    drops = jnp.asarray(lr_drop_iters, jnp.int32)

    def step(carry, it):
        z, opt, best_z, min_err = carry
        (loss, err), g = jax.value_and_grad(
            lambda zz: _scaled_loss(zz), has_aux=True
        )(z)
        better = err < min_err
        best_z = jnp.where(better, z, best_z)
        min_err = jnp.where(better, err, min_err)
        lr = base_lr * 0.5 ** jnp.sum(it >= drops)
        z, opt = optim.apply(z, g, opt, lr)
        return (z, opt, best_z, min_err), loss

    def _scaled_loss(zz):
        loss, err = matchloss_from_base(zz, bundle)
        return loss_scale * loss, err

    opt0 = optim.init(z0)
    init = (z0, opt0, z0, jnp.full_like(z0, jnp.inf))
    (z, _, best_z, min_err), losses = jax.lax.scan(
        step, init, jnp.arange(iterations, dtype=jnp.int32)
    )
    return InitStageResult(best_z=best_z, min_err=min_err, final_loss=losses[-1])


def promote_matches(
    bundle: MatchBundle,
    best_z: np.ndarray,
    min_err: np.ndarray,
    err_threshold: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Select converged matches as ray-Gaussian seeds (host-side, one-time).

    Matches `create_from_pcd`'s vmask filter (`scene/gaussian_model.py:
    394-395`): keep matches whose best reprojection error < 0.1 (the warp
    mask is NOT part of the filter in the reference — only padding is
    excluded), concatenated in ordered-pair order.
    Returns (rayo, rayd, zval, color) numpy arrays.
    """
    mask = (np.asarray(min_err) < err_threshold) & np.asarray(bundle.pad_valid)
    sel = mask.reshape(-1)
    rayo = np.asarray(bundle.rays_o).reshape(-1, 3)[sel]
    rayd = np.asarray(bundle.rays_d).reshape(-1, 3)[sel]
    z = np.asarray(best_z).reshape(-1)[sel]
    color = np.asarray(bundle.color).reshape(-1, 3)[sel]
    return rayo, rayd, z, color
