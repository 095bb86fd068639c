"""Multi-device training: camera-batch data parallelism over a Mesh.

The reference is strictly single-GPU (SURVEY.md section 2.3: no distributed
execution of any kind), so the multi-chip strategy is a first-class design
of this framework rather than a port:

- **DP over cameras** (this module): each device renders + differentiates a
  different training view against replicated parameters; gradients are
  `psum`ed over the mesh's ICI and a single Adam update is applied
  replicated. Semantics = reference with batch=k cameras per step (keep
  k=1 per-device batch and 1 device for exact parity runs).
- **Tile sharding** (parallel/tiles.py): the rasterizer's tile grid is
  sharded for single-view rendering — the "sequence/context parallel"
  analog for rasterization (SURVEY.md section 5.7).

Built on shard_map so the same program runs on the virtual CPU mesh in tests
and on real TPU slices; no NCCL-style code, XLA collectives only.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scgaussian_tpu.config import OptimizationConfig, RasterizerConfig, TrainExtras
from scgaussian_tpu.core.cameras import Camera
from scgaussian_tpu.losses import l1_loss, ssim
from scgaussian_tpu.model.gaussians import GaussianModel
from scgaussian_tpu.model.matches import MatchBundle, matchloss_from_renderdepth
from scgaussian_tpu.train import optim
from scgaussian_tpu.train.main_stage import lr_tree, render_model


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(jax.make_mesh((len(devs),), (axis,), devices=devs).devices, (axis,))


def dp_train_step(
    mesh: Mesh,
    model: GaussianModel,
    opt_state: optim.AdamState,
    bundle: MatchBundle,
    cameras: Camera,  # batched pytree: leaves [D, ...] (same static H/W)
    gt_images: jnp.ndarray,  # [D, 3, H, W]
    view_idx: jnp.ndarray,  # [D]
    iteration: jnp.ndarray,
    bg_color: jnp.ndarray,  # [3]
    opt_cfg: OptimizationConfig,
    raster: RasterizerConfig = RasterizerConfig(),
    extras: TrainExtras = TrainExtras(),
    backend: str = "tpu",
) -> Tuple[GaussianModel, optim.AdamState, jnp.ndarray]:
    """One data-parallel step: per-device camera, psum'd grads, replicated
    Adam. Returns (model, opt_state, mean_loss)."""
    axis = mesh.axis_names[0]

    def per_device(params, cam, gt, vid):
        # cam/gt/vid arrive with a leading per-device batch dim of 1
        cam = jax.tree_util.tree_map(lambda x: x[0], cam)
        gt = gt[0]
        vid = vid[0]
        width, height = cam.width, cam.height
        offset0 = jnp.zeros((model.total, 2), jnp.float32)

        def loss_fn(p, off):
            m = dataclasses.replace(model, params=p)
            out = render_model(
                cam, m, bg_color, mean2d_offset=off, backend=backend, raster=raster
            )
            ll1 = l1_loss(out.render, gt)
            loss = (1 - opt_cfg.lambda_dssim) * ll1 + opt_cfg.lambda_dssim * (
                1 - ssim(out.render, gt)
            )
            loss = loss + extras.render_match_loss_weight * matchloss_from_renderdepth(
                bundle, vid, out.rendered_depth
            )
            return loss, out.radii

        (loss, radii), (grads, g_off) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset0)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        # densification stats, SUMMED over the camera batch (reference
        # accumulates one camera/iter; DP accumulates k cameras/step)
        vis = radii > 0
        g_ndc = g_off * jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)[None, :]
        norm = jnp.linalg.norm(g_ndc, axis=-1, keepdims=True)
        d_accum = jax.lax.psum(jnp.where(vis[:, None], norm, 0.0), axis)
        d_denom = jax.lax.psum(vis[:, None].astype(jnp.float32), axis)
        radii_max = jax.lax.pmax(jnp.where(vis, radii, 0), axis)
        return loss, grads, d_accum, d_denom, radii_max

    shard = functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    loss, grads, d_accum, d_denom, radii_max = shard(per_device)(
        model.params, cameras, gt_images, view_idx
    )

    model = dataclasses.replace(
        model,
        xyz_gradient_accum=model.xyz_gradient_accum + d_accum,
        denom=model.denom + d_denom,
        max_radii2d=jnp.maximum(model.max_radii2d, radii_max.astype(jnp.float32)),
    )
    lrs = lr_tree(model.params, opt_cfg, model.spatial_lr_scale, iteration)
    new_params, opt_state = optim.apply(model.params, grads, opt_state, lrs)
    model = dataclasses.replace(model, params=new_params)
    return model, opt_state, loss


def stack_cameras(cams) -> Camera:
    """Stack a list of same-size Camera pytrees into leading-dim batches."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
