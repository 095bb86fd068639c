"""Multi-device training: camera-batch data parallelism over a Mesh.

The reference is strictly single-GPU (SURVEY.md section 2.3: no distributed
execution of any kind), so the multi-chip strategy is a first-class design
of this framework rather than a port:

- **DP over cameras** (this module): each device renders + differentiates a
  different training view against replicated parameters; gradients are
  `psum`ed over the mesh's ICI and a single Adam update is applied
  replicated. Semantics = reference with batch=k cameras per step (keep
  k=1 per-device batch and 1 device for exact parity runs); with all
  devices fed the SAME camera, one DP step equals one single-device step
  exactly (pmean of identical grads).
- **Tile sharding** (parallel/tiles.py): the rasterizer's tile grid is
  sharded for single-view rendering — the "sequence/context parallel"
  analog for rasterization (SURVEY.md section 5.7).

The per-camera loss is `main_stage.make_camera_loss` — the SAME closure the
single-device `train_step` differentiates (DTU dark-row mask + alpha penalty
included), and the update is `main_stage.apply_update` (same LR schedule and
final-iteration skip), so the two step functions cannot drift.

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
from scgaussian_tpu.model.gaussians import GaussianModel
from scgaussian_tpu.model.matches import MatchBundle
from scgaussian_tpu.train import optim
from scgaussian_tpu.train.main_stage import (
    StepMetrics,
    apply_update,
    make_camera_loss,
)


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(jax.make_mesh((len(devs),), (axis,), devices=devs).devices, (axis,))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "opt_cfg", "raster", "extras", "backend", "is_dtu"),
)
def dp_train_step(
    mesh: Mesh,
    model: GaussianModel,
    opt_state: optim.AdamState,
    bundle: MatchBundle,
    cameras: Camera,  # batched pytree: leaves [D, ...] (same static H/W)
    gt_images: jnp.ndarray,  # [D, 3, H, W]
    view_idx: jnp.ndarray,  # [D]
    iteration: jnp.ndarray,  # [] int32 (1-based like the reference)
    bg_color: jnp.ndarray,  # [3]
    opt_cfg: OptimizationConfig,
    raster: RasterizerConfig = RasterizerConfig(),
    extras: TrainExtras = TrainExtras(),
    backend: str = "tpu",
    is_dtu: bool = False,
) -> Tuple[GaussianModel, optim.AdamState, StepMetrics]:
    """One data-parallel step: per-device camera, psum'd grads, replicated
    Adam. Full semantic parity with `train_step` (DTU branch, densify-stats
    accumulation, final-iteration skip) — one step consumes D cameras.
    Returns (model, opt_state, StepMetrics); metrics are batch means except
    `overflow`, which is the per-device MAX (what the pipeline's regrow
    guard needs: each camera overflowed the SAME static budget)."""
    axis = mesh.axis_names[0]

    def per_device(params, cam, gt, vid):
        # cam/gt/vid arrive with a leading per-device batch dim of 1
        cam = jax.tree_util.tree_map(lambda x: x[0], cam)
        gt = gt[0]
        vid = vid[0]
        width, height = cam.width, cam.height
        offset0 = jnp.zeros((model.total, 2), jnp.float32)

        loss_fn = make_camera_loss(
            model, bundle, cam, gt, vid, bg_color,
            opt_cfg, raster, extras, backend, is_dtu,
        )
        (loss, (out, ll1, mloss)), (grads, g_off) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset0)
        grads = jax.lax.pmean(grads, axis)
        metrics = StepMetrics(
            loss=jax.lax.pmean(loss, axis),
            l1=jax.lax.pmean(ll1, axis),
            match_loss=jax.lax.pmean(mloss, axis),
            num_visible=jax.lax.pmax(jnp.sum(out.radii > 0), axis),
            overflow=jax.lax.pmax(out.overflow, axis),
        )
        # densification stats, SUMMED over the camera batch (reference
        # accumulates one camera/iter; DP accumulates k cameras/step)
        vis = out.radii > 0
        g_ndc = g_off * jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)[None, :]
        norm = jnp.linalg.norm(g_ndc, axis=-1, keepdims=True)
        d_accum = jax.lax.psum(jnp.where(vis[:, None], norm, 0.0), axis)
        d_denom = jax.lax.psum(vis[:, None].astype(jnp.float32), axis)
        radii_max = jax.lax.pmax(jnp.where(vis, out.radii, 0), axis)
        return metrics, grads, d_accum, d_denom, radii_max

    shard = functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    metrics, grads, d_accum, d_denom, radii_max = shard(per_device)(
        model.params, cameras, gt_images, view_idx
    )

    # densification stats (`train.py:190-193`), only while densifying —
    # same gating as train_step
    in_densify = iteration < opt_cfg.densify_until_iter
    stats_model = dataclasses.replace(
        model,
        xyz_gradient_accum=model.xyz_gradient_accum + d_accum,
        denom=model.denom + d_denom,
        max_radii2d=jnp.maximum(model.max_radii2d, radii_max.astype(jnp.float32)),
    )
    model = jax.tree_util.tree_map(
        lambda a, b: jnp.where(in_densify, a, b), stats_model, model
    )

    model, opt_state = apply_update(model, opt_state, grads, iteration, opt_cfg)
    return model, opt_state, metrics


def stack_cameras(cams, xp=jnp) -> Camera:
    """Stack a list of same-size Camera pytrees into leading-dim batches.
    Multi-host callers pass xp=numpy: numpy leaves are global values jit can
    shard over a cross-process mesh (host-local jax.Arrays are not)."""
    return jax.tree_util.tree_map(lambda *xs: xp.stack(xs), *cams)
