"""Model persistence: reference-compatible PLY snapshots + checkpoints.

PLY layout matches the reference exactly for interop with its tooling:
- foreground: x,y,z,nx,ny,nz,f_dc_*,f_rest_* (channel-major),opacity,
  scale_*,rot_*,zval_*,rayo_*,rayd_* (`scene/gaussian_model.py:531-549,
  565-586`)
- background: b-prefixed names in point_cloud_bg.ply (`:551-563, 588-601`)
- colored cloud point_cloud_color.ply (`:603-609`)
- init-stage sparse depth maps + matchpoint cloud (`save_ply_at_matchpoint`,
  `:611-642`)

Checkpoints (capture/restore analog, `scene/gaussian_model.py:71-103`) are a
single .npz of the flattened (model, opt_state, iteration) pytree — unlike
the reference, the full hybrid ray state round-trips (its torch capture()
references `_xyz`, which no longer exists post-create_from_pcd, so resume is
latently broken upstream; see SURVEY.md section 5.4).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scgaussian_tpu.core import transforms
from scgaussian_tpu.data import ply as ply_io
from scgaussian_tpu.model.gaussians import GaussianModel, GaussianParams
from scgaussian_tpu.train import optim


def _mkdirp(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def save_ply(model: GaussianModel, path: str) -> None:
    """save_ply (`scene/gaussian_model.py:565-609`). Only alive bg rows are
    written; fg is written in full (it is always fully alive)."""
    _mkdirp(os.path.dirname(path))
    p = model.params
    nr = model.num_ray
    xyz = np.asarray(model.rayo + model.rayd * p.zval)
    f_dc = np.asarray(p.f_dc).transpose(0, 2, 1).reshape(nr, -1)  # channel-major
    f_rest = np.asarray(p.f_rest).transpose(0, 2, 1).reshape(nr, -1)

    props = {}
    for i, n in enumerate("xyz"):
        props[n] = xyz[:, i].astype(np.float32)
    for i, n in enumerate(["nx", "ny", "nz"]):
        props[n] = np.zeros(nr, np.float32)
    for i in range(f_dc.shape[1]):
        props[f"f_dc_{i}"] = f_dc[:, i].astype(np.float32)
    for i in range(f_rest.shape[1]):
        props[f"f_rest_{i}"] = f_rest[:, i].astype(np.float32)
    props["opacity"] = np.asarray(p.opacity)[:, 0].astype(np.float32)
    for i in range(3):
        props[f"scale_{i}"] = np.asarray(p.scaling)[:, i].astype(np.float32)
    for i in range(4):
        props[f"rot_{i}"] = np.asarray(p.rotation)[:, i].astype(np.float32)
    props["zval_0"] = np.asarray(p.zval)[:, 0].astype(np.float32)
    for i in range(3):
        props[f"rayo_{i}"] = np.asarray(model.rayo)[:, i].astype(np.float32)
    for i in range(3):
        props[f"rayd_{i}"] = np.asarray(model.rayd)[:, i].astype(np.float32)
    ply_io.write_ply(path, props)

    alive = np.asarray(model.bg_alive)
    bg_dir = os.path.dirname(path)
    all_xyz, all_dc = xyz, f_dc
    if alive.any():
        nb = int(alive.sum())
        bg_xyz = np.asarray(p.bg_xyz)[alive]
        bg_dc = np.asarray(p.bg_f_dc)[alive].transpose(0, 2, 1).reshape(nb, -1)
        bg_rest = np.asarray(p.bg_f_rest)[alive].transpose(0, 2, 1).reshape(nb, -1)
        bprops = {}
        for i, n in enumerate(["bx", "by", "bz"]):
            bprops[n] = bg_xyz[:, i].astype(np.float32)
        for n in ["bnx", "bny", "bnz"]:
            bprops[n] = np.zeros(nb, np.float32)
        for i in range(bg_dc.shape[1]):
            bprops[f"bf_dc_{i}"] = bg_dc[:, i].astype(np.float32)
        for i in range(bg_rest.shape[1]):
            bprops[f"bf_rest_{i}"] = bg_rest[:, i].astype(np.float32)
        bprops["bopacity"] = np.asarray(p.bg_opacity)[alive][:, 0].astype(np.float32)
        for i in range(3):
            bprops[f"bscale_{i}"] = np.asarray(p.bg_scaling)[alive][:, i].astype(np.float32)
        for i in range(4):
            bprops[f"brot_{i}"] = np.asarray(p.bg_rotation)[alive][:, i].astype(np.float32)
        ply_io.write_ply(os.path.join(bg_dir, "point_cloud_bg.ply"), bprops)
        all_xyz = np.concatenate([xyz, bg_xyz])
        all_dc = np.concatenate([f_dc, bg_dc])

    ply_io.store_point_cloud(
        os.path.join(bg_dir, "point_cloud_color.ply"), all_xyz, all_dc * 255
    )


def load_ply(path: str, max_sh_degree: int, bg_capacity: int = 65536,
             spatial_lr_scale: float = 1.0) -> GaussianModel:
    """load_ply incl. point_cloud_bg.ply (`scene/gaussian_model.py:653-756`).
    active_sh_degree is set to max (`:715`)."""
    v = ply_io.read_ply(path)
    nr = len(v["x"])
    k = (max_sh_degree + 1) ** 2

    def stack(prefix, n):
        names = sorted(
            [nm for nm in v if nm.startswith(prefix)], key=lambda s: int(s.split("_")[-1])
        )
        assert len(names) == n, (prefix, len(names), n)
        return np.stack([v[nm] for nm in names], axis=1)

    f_dc = stack("f_dc_", 3).reshape(nr, 3, 1).transpose(0, 2, 1)
    f_rest = stack("f_rest_", 3 * (k - 1)).reshape(nr, 3, k - 1).transpose(0, 2, 1)
    scaling = stack("scale_", 3)
    rotation = stack("rot_", 4)
    zval = v["zval_0"].reshape(nr, 1)
    rayo = stack("rayo_", 3)
    rayd = stack("rayd_", 3)
    opacity = v["opacity"].reshape(nr, 1)

    cb = bg_capacity
    bg = dict(
        bg_xyz=np.zeros((cb, 3), np.float32),
        bg_f_dc=np.zeros((cb, 1, 3), np.float32),
        bg_f_rest=np.zeros((cb, k - 1, 3), np.float32),
        bg_scaling=np.full((cb, 3), -10.0, np.float32),
        bg_rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (cb, 1)),
        bg_opacity=np.full((cb, 1), -10.0, np.float32),
    )
    bg_alive = np.zeros((cb,), bool)

    bg_path = os.path.join(os.path.dirname(path), "point_cloud_bg.ply")
    if os.path.exists(bg_path):
        bv = ply_io.read_ply(bg_path)
        nb = len(bv["bx"])
        assert nb <= cb, f"bg capacity {cb} < saved bg count {nb}"

        def bstack(prefix, n):
            names = sorted(
                [nm for nm in bv if nm.startswith(prefix)],
                key=lambda s: int(s.split("_")[-1]),
            )
            assert len(names) == n
            return np.stack([bv[nm] for nm in names], axis=1)

        bg["bg_xyz"][:nb] = np.stack([bv["bx"], bv["by"], bv["bz"]], axis=1)
        bg["bg_f_dc"][:nb] = bstack("bf_dc_", 3).reshape(nb, 3, 1).transpose(0, 2, 1)
        bg["bg_f_rest"][:nb] = (
            bstack("bf_rest_", 3 * (k - 1)).reshape(nb, 3, k - 1).transpose(0, 2, 1)
        )
        bg["bg_scaling"][:nb] = bstack("bscale_", 3)
        bg["bg_rotation"][:nb] = bstack("brot_", 4)
        bg["bg_opacity"][:nb] = bv["bopacity"].reshape(nb, 1)
        bg_alive[:nb] = True

    params = GaussianParams(
        zval=jnp.asarray(zval, jnp.float32),
        f_dc=jnp.asarray(f_dc, jnp.float32),
        f_rest=jnp.asarray(f_rest, jnp.float32),
        scaling=jnp.asarray(scaling, jnp.float32),
        rotation=jnp.asarray(rotation, jnp.float32),
        opacity=jnp.asarray(opacity, jnp.float32),
        **{kk: jnp.asarray(vv, jnp.float32) for kk, vv in bg.items()},
    )
    n = nr + cb
    return GaussianModel(
        params=params,
        rayo=jnp.asarray(rayo, jnp.float32),
        rayd=jnp.asarray(rayd, jnp.float32),
        bg_alive=jnp.asarray(bg_alive),
        active_sh_degree=jnp.int32(max_sh_degree),
        xyz_gradient_accum=jnp.zeros((n, 1), jnp.float32),
        denom=jnp.zeros((n, 1), jnp.float32),
        max_radii2d=jnp.zeros((n,), jnp.float32),
        max_sh_degree=max_sh_degree,
        spatial_lr_scale=spatial_lr_scale,
    )


def save_matchpoints(bundle, zvals: np.ndarray, view_names, out_dir: str) -> None:
    """save_ply_at_matchpoint (`scene/gaussian_model.py:611-642`): matchpoint
    colored cloud + per-view sparse depth .npy/.png."""
    from PIL import Image

    _mkdirp(out_dir)
    rays_o = np.asarray(bundle.rays_o)
    rays_d = np.asarray(bundle.rays_d)
    cam_rays_d = np.asarray(bundle.cam_rays_d)
    uv = np.asarray(bundle.uv)
    color = np.asarray(bundle.color)
    valid = np.asarray(bundle.pad_valid)
    src = np.asarray(bundle.src)
    H, W = bundle.height, bundle.width

    xyz = (rays_o + rays_d * zvals[..., None]).reshape(-1, 3)[valid.reshape(-1)]
    col = color.reshape(-1, 3)[valid.reshape(-1)]
    ply_io.store_point_cloud(
        os.path.join(out_dir, "point_cloud_matchpoint.ply"), xyz, col * 255
    )

    for v, name in enumerate(view_names):
        sparse = np.zeros((H, W), np.float32)
        pair_ids = np.nonzero(src == v)[0]
        for pid in pair_ids:
            m = valid[pid]
            d = zvals[pid, m] * cam_rays_d[pid, m, 2]
            px = np.clip(uv[pid, m, 0], 0, W - 1).astype(np.int64)
            py = np.clip(uv[pid, m, 1], 0, H - 1).astype(np.int64)
            sparse[py, px] = d
        np.save(os.path.join(out_dir, f"{name}.npy"), sparse)
        rng = sparse.max() - sparse.min()
        norm = (sparse - sparse.min()) / (rng if rng > 0 else 1.0)
        Image.fromarray((norm * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"sparsedepth_{name}.png")
        )


# ---------------- checkpoints ----------------

def save_checkpoint(path: str, model: GaussianModel, opt_state: optim.AdamState,
                    iteration: int) -> None:
    _mkdirp(os.path.dirname(path) or ".")
    leaves, treedef = jax.tree_util.tree_flatten((model, opt_state))
    np.savez(
        path,
        iteration=iteration,
        num_leaves=len(leaves),
        max_sh_degree=model.max_sh_degree,
        spatial_lr_scale=model.spatial_lr_scale,
        num_ray=model.num_ray,
        bg_capacity=model.bg_capacity,
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_checkpoint(path: str, template_model: GaussianModel,
                    template_opt: optim.AdamState) -> Tuple[GaussianModel, optim.AdamState, int]:
    data = np.load(path)
    _, treedef = jax.tree_util.tree_flatten((template_model, template_opt))
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(int(data["num_leaves"]))]
    model, opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return model, opt_state, int(data["iteration"])


# ---------------- async checkpoints (Orbax) ----------------

class AsyncCheckpointer:
    """Orbax-backed async checkpointing (SURVEY.md 5.3-5.4): saves proceed
    in a background thread so the train loop never blocks on persistence;
    restart-from-checkpoint is the failure-recovery path."""

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckpt = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def save(self, directory: str, model: GaussianModel, opt_state: optim.AdamState,
             iteration: int) -> None:
        leaves, _ = jax.tree_util.tree_flatten((model, opt_state))
        payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
        payload["iteration"] = np.asarray(iteration)
        payload["num_ray"] = np.asarray(model.num_ray)
        payload["bg_capacity"] = np.asarray(model.bg_capacity)
        self._ckpt.save(os.path.abspath(directory), payload, force=True)

    def restore(self, directory: str, template_model: GaussianModel,
                template_opt: optim.AdamState):
        self.wait()
        import orbax.checkpoint as ocp

        sync = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        payload = sync.restore(os.path.abspath(directory))
        _, treedef = jax.tree_util.tree_flatten((template_model, template_opt))
        n = len(jax.tree_util.tree_flatten((template_model, template_opt))[0])
        leaves = [jnp.asarray(payload[f"leaf_{i}"]) for i in range(n)]
        model, opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        return model, opt_state, int(payload["iteration"])

    def wait(self) -> None:
        self._ckpt.wait_until_finished()
