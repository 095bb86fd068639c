"""Densification / pruning / opacity reset as statically-shaped jitted steps.

Reproduces `densify_and_prune` + `densify_and_clone` + `densify_and_split` +
`reset_opacity` (`scene/gaussian_model.py:644-651,864-928`) on the fixed-
capacity alive-mask model: instead of reallocating tensors and rewriting the
optimizer (`scene/gaussian_model.py:758-842`), new Gaussians are scattered
into free background slots, prunes clear the alive mask, and Adam moments get
row-zeroed — semantics preserved, zero recompiles.

Reference invariants kept exactly:
- clone/split both *emit into the background set* regardless of whether the
  source is a ray or bg Gaussian (`scene/gaussian_model.py:844-858`)
- ray Gaussians are never pruned (`:927`); split-selected ray Gaussians
  instead get their log-scale divided by 0.8*N in place (`:888-893` — the
  reference divides the *log-domain* scaling; replicated verbatim)
- split-selected bg Gaussians are pruned (`:895-896`)
- `replace_tensor_to_optimizer` zeroes the whole group's Adam moments
  (`:758-775`) — applied to fg scaling on split and to opacity on reset
- densification stats are zeroed after each event (`:860-862`)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from scgaussian_tpu.core import transforms
from scgaussian_tpu.model.gaussians import GaussianModel, GaussianParams
from scgaussian_tpu.train import optim


def update_stats(
    model: GaussianModel,
    radii: jnp.ndarray,
    viewspace_grad_pix: jnp.ndarray,
    width: int,
    height: int,
) -> GaussianModel:
    """Per-iteration stats accumulation (`train.py:190-193`,
    `scene/gaussian_model.py:932-934`).

    `viewspace_grad_pix` is d(loss)/d(mean2d in pixels); the reference's
    screenspace gradient is in NDC units, i.e. pixel-grad * (0.5 W, 0.5 H)
    (CUDA backward's ddelx_dx factor), so we rescale before the norm to keep
    the densify_grad_threshold semantics identical.
    """
    vis = radii > 0
    max_radii2d = jnp.where(
        vis, jnp.maximum(model.max_radii2d, radii.astype(jnp.float32)), model.max_radii2d
    )
    g_ndc = viewspace_grad_pix * jnp.asarray(
        [0.5 * width, 0.5 * height], jnp.float32
    )[None, :]
    norm = jnp.linalg.norm(g_ndc, axis=-1, keepdims=True)
    accum = model.xyz_gradient_accum + jnp.where(vis[:, None], norm, 0.0)
    denom = model.denom + vis[:, None].astype(jnp.float32)
    return dataclasses.replace(
        model, xyz_gradient_accum=accum, denom=denom, max_radii2d=max_radii2d
    )


def _free_slot_table(bg_alive: jnp.ndarray) -> jnp.ndarray:
    """free_positions[r] = index of the r-th dead bg slot (stable order)."""
    return jnp.argsort(bg_alive.astype(jnp.int32), stable=True)


@functools.partial(
    jax.jit,
    static_argnames=("max_screen_size", "split_n", "fg_split_log_quirk"),
)
def densify_and_prune(
    model: GaussianModel,
    opt_state: optim.AdamState,
    rng: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: int | None,
    percent_dense: float,
    split_n: int = 2,
    fg_split_log_quirk: bool = True,
) -> Tuple[GaussianModel, optim.AdamState, jnp.ndarray]:
    """One densify+prune maintenance event (`train.py:195-197`), jitted so
    the ~50-op state surgery is one dispatch instead of eager op-by-op.

    Returns (model, opt_state, dropped_count) where dropped_count is the
    number of would-be new Gaussians that didn't fit in bg capacity.

    `rng` may also be raw uint32 key DATA (jax.random.key_data): multi-host
    callers must pass every per-step input as numpy or a global array, and
    typed key arrays are host-local — the wrap happens inside the jit.
    """
    if rng.dtype == jnp.uint32:
        rng = jax.random.wrap_key_data(rng)
    nr = model.num_ray
    cb = model.bg_capacity
    n = nr + cb
    p = model.params

    grads = model.xyz_gradient_accum / model.denom
    grads = jnp.where(jnp.isnan(grads), 0.0, grads).squeeze(-1)  # [N]

    alive = model.alive_mask()
    xyz = model.get_xyz()
    scaling_act = model.get_scaling()
    max_scale = jnp.max(scaling_act, axis=1)
    rot_all = jnp.concatenate([p.rotation, p.bg_rotation], axis=0)
    f_dc_all = jnp.concatenate([p.f_dc, p.bg_f_dc], axis=0)
    f_rest_all = jnp.concatenate([p.f_rest, p.bg_f_rest], axis=0)
    opac_all = jnp.concatenate([p.opacity, p.bg_opacity], axis=0)
    scal_all = jnp.concatenate([p.scaling, p.bg_scaling], axis=0)

    # --- clone selection (`scene/gaussian_model.py:898-913`)
    sel_clone = (grads >= max_grad) & (max_scale <= percent_dense * extent) & alive

    # --- split selection (`scene/gaussian_model.py:864-896`)
    sel_split = (grads >= max_grad) & (max_scale > percent_dense * extent) & alive

    # split children: N(0, scaling) samples rotated into world frame
    keys = jax.random.split(rng, split_n)
    R = transforms.quat_to_rotmat(rot_all)  # [N, 3, 3]
    child_xyz = []
    for k in keys:
        samples = jax.random.normal(k, (n, 3)) * scaling_act
        child_xyz.append(jnp.einsum("nij,nj->ni", R, samples) + xyz)
    child_scaling = jnp.log(scaling_act / (0.8 * split_n))

    # --- candidate table: [clones; child_1; ...; child_N]
    cand_mask = jnp.concatenate([sel_clone] + [sel_split] * split_n, axis=0)
    cand_xyz = jnp.concatenate([xyz] + child_xyz, axis=0)
    cand_scaling = jnp.concatenate([scal_all] + [child_scaling] * split_n, axis=0)
    cand_rotation = jnp.concatenate([rot_all] * (1 + split_n), axis=0)
    cand_f_dc = jnp.concatenate([f_dc_all] * (1 + split_n), axis=0)
    cand_f_rest = jnp.concatenate([f_rest_all] * (1 + split_n), axis=0)
    cand_opacity = jnp.concatenate([opac_all] * (1 + split_n), axis=0)

    # --- allocation into free bg slots
    free_pos = _free_slot_table(model.bg_alive)  # [Cb]
    num_free = jnp.sum(~model.bg_alive)
    rank = jnp.cumsum(cand_mask.astype(jnp.int32)) - 1  # [-1.. for masked]
    fits = cand_mask & (rank < num_free) & (rank < cb)
    dest = jnp.where(fits, free_pos[jnp.clip(rank, 0, cb - 1)], cb)  # cb => drop
    dropped = jnp.sum(cand_mask) - jnp.sum(fits)

    def scatter(base, cand):
        return base.at[dest].set(cand, mode="drop")

    new_bg_xyz = scatter(p.bg_xyz, cand_xyz)
    new_bg_scaling = scatter(p.bg_scaling, cand_scaling)
    new_bg_rotation = scatter(p.bg_rotation, cand_rotation)
    new_bg_f_dc = scatter(p.bg_f_dc, cand_f_dc)
    new_bg_f_rest = scatter(p.bg_f_rest, cand_f_rest)
    new_bg_opacity = scatter(p.bg_opacity, cand_opacity)
    new_slot = jnp.zeros((cb,), bool).at[dest].set(fits, mode="drop")
    bg_alive = model.bg_alive | new_slot

    # --- fg split parents. The reference divides the LOG-domain scaling by
    # 0.8*N (`scene/gaussian_model.py:889-890`) which GROWS typical
    # (negative-log) scales — replicated by default for parity; set
    # fg_split_log_quirk=False for the activated-domain shrink
    # log(scale / (0.8*N)) that the bg children use.
    sel_split_fg = sel_split[:nr]
    if fg_split_log_quirk:
        fg_split_scaling = p.scaling / (0.8 * split_n)
    else:
        fg_split_scaling = p.scaling - jnp.log(0.8 * split_n)
    new_fg_scaling = jnp.where(sel_split_fg[:, None], fg_split_scaling, p.scaling)

    # --- prune (`scene/gaussian_model.py:915-928`): opacity, screen size,
    # world size; never fg; bg split parents always pruned.
    opacity_act = jax.nn.sigmoid(opac_all.squeeze(-1))
    # recompute on post-update values for new slots
    bg_opacity_act = jax.nn.sigmoid(new_bg_opacity.squeeze(-1))
    bg_max_scale = jnp.max(jnp.exp(new_bg_scaling), axis=1)
    prune_bg = bg_opacity_act < min_opacity
    if max_screen_size is not None:
        # NOTE: the reference's screen-size term is dead logic — max_radii2D
        # is zeroed by densification_postfix (`scene/gaussian_model.py:862`)
        # right before the prune reads it (`:924`), so big_points_vs is
        # always all-False. Replicated (no radii-based pruning).
        prune_bg = prune_bg | (bg_max_scale > 0.2 * extent)
    prune_bg = prune_bg | sel_split[nr:]  # split bg parents die
    bg_alive = bg_alive & ~prune_bg

    params = dataclasses.replace(
        model.params,
        scaling=new_fg_scaling,
        bg_xyz=new_bg_xyz,
        bg_f_dc=new_bg_f_dc,
        bg_f_rest=new_bg_f_rest,
        bg_scaling=new_bg_scaling,
        bg_rotation=new_bg_rotation,
        bg_opacity=new_bg_opacity,
    )

    # --- optimizer surgery: zero moments of all fg scaling (replace_tensor
    # semantics on split) and of every bg slot that changed identity.
    opt_state = optim.zero_moments_leaf(opt_state, "scaling")
    changed_bg = new_slot | prune_bg
    opt_state = optim.zero_moments_rows(
        opt_state,
        {
            name: changed_bg
            for name in (
                "bg_xyz",
                "bg_f_dc",
                "bg_f_rest",
                "bg_scaling",
                "bg_rotation",
                "bg_opacity",
            )
        },
    )

    model = dataclasses.replace(
        model,
        params=params,
        bg_alive=bg_alive,
        xyz_gradient_accum=jnp.zeros((n, 1), jnp.float32),
        denom=jnp.zeros((n, 1), jnp.float32),
        max_radii2d=jnp.zeros((n,), jnp.float32),
    )
    return model, opt_state, dropped


def grow_bg_capacity(
    model: GaussianModel, opt_state: optim.AdamState, new_capacity: int
) -> Tuple[GaussianModel, optim.AdamState]:
    """Grow the background slot pool to `new_capacity` (a rare, explicit
    recompile event — the fixed-capacity analog of the reference's unbounded
    tensor growth, `scene/gaussian_model.py:777-842`). New slots are dead
    (alive=False, opacity logit -10) with zero Adam moments; densification
    stats gain zero rows. Called by the training pipeline's capacity guard
    when `densify_and_prune` reports dropped candidates."""
    cb = model.bg_capacity
    if new_capacity <= cb:
        return model, opt_state
    add = new_capacity - cb
    p = model.params

    def pad(x, fill=0.0):
        pad_block = jnp.full((add,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad_block], axis=0)

    rot_pad = jnp.zeros((add, 4), p.bg_rotation.dtype).at[:, 0].set(1.0)
    params = dataclasses.replace(
        p,
        bg_xyz=pad(p.bg_xyz),
        bg_f_dc=pad(p.bg_f_dc),
        bg_f_rest=pad(p.bg_f_rest),
        bg_scaling=pad(p.bg_scaling, -10.0),
        bg_rotation=jnp.concatenate([p.bg_rotation, rot_pad], axis=0),
        bg_opacity=pad(p.bg_opacity, -10.0),
    )

    def pad_state(tree):
        return dataclasses.replace(
            tree,
            **{
                name: pad(getattr(tree, name))
                for name in (
                    "bg_xyz", "bg_f_dc", "bg_f_rest",
                    "bg_scaling", "bg_rotation", "bg_opacity",
                )
            },
        )

    opt_state = optim.AdamState(
        m=pad_state(opt_state.m), v=pad_state(opt_state.v), count=opt_state.count
    )
    model = dataclasses.replace(
        model,
        params=params,
        bg_alive=pad(model.bg_alive),
        xyz_gradient_accum=pad(model.xyz_gradient_accum),
        denom=pad(model.denom),
        max_radii2d=pad(model.max_radii2d),
    )
    return model, opt_state


@jax.jit
def reset_opacity(
    model: GaussianModel, opt_state: optim.AdamState
) -> Tuple[GaussianModel, optim.AdamState]:
    """`reset_opacity` (`scene/gaussian_model.py:644-651`): clamp activated
    opacity to <= 0.01, store back in logit domain, zero opacity moments."""

    def reset(raw):
        act = jnp.minimum(jax.nn.sigmoid(raw), 0.01)
        return transforms.inverse_sigmoid(act)

    params = dataclasses.replace(
        model.params,
        opacity=reset(model.params.opacity),
        bg_opacity=reset(model.params.bg_opacity),
    )
    opt_state = optim.zero_moments_leaf(opt_state, "opacity")
    opt_state = optim.zero_moments_leaf(opt_state, "bg_opacity")
    return dataclasses.replace(model, params=params), opt_state
