"""LLFF pose conventions and spiral render paths (host-side numpy).

Covers the live subset of the reference's `utils/pose_utils.py`: pose
recenter/backcenter (`:442-452`), average pose / view matrices (`:465-483`),
forward-facing spiral (`generate_spiral_path`, `:486-510`), DTU spiral
(`:522-540`), and the `poses_bounds.npy` convention helpers
(`convert_poses`, `:355-370`)."""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def normalize(x: np.ndarray) -> np.ndarray:
    return x / np.linalg.norm(x)


def pad_poses(p: np.ndarray) -> np.ndarray:
    bottom = np.broadcast_to([0, 0, 0, 1.0], p[..., :1, :4].shape)
    return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def unpad_poses(p: np.ndarray) -> np.ndarray:
    return p[..., :3, :4]


def viewmatrix(lookdir, up, position, subtract_position=False) -> np.ndarray:
    """`utils/pose_utils.py:475-481`."""
    vec2 = normalize((position - lookdir) if subtract_position else lookdir)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, position], axis=1)


def poses_avg(poses: np.ndarray) -> np.ndarray:
    """`utils/pose_utils.py:465-471`."""
    position = poses[:, :3, 3].mean(0)
    z_axis = poses[:, :3, 2].mean(0)
    up = poses[:, :3, 1].mean(0)
    return viewmatrix(z_axis, up, position)


def recenter_poses(poses: np.ndarray) -> np.ndarray:
    """`utils/pose_utils.py:442-446`."""
    cam2world = poses_avg(poses)
    return unpad_poses(np.linalg.inv(pad_poses(cam2world)) @ pad_poses(poses))


def backcenter_poses(poses: np.ndarray, pose_ref: np.ndarray) -> np.ndarray:
    """`utils/pose_utils.py:448-452`."""
    cam2world = poses_avg(pose_ref)
    return unpad_poses(pad_poses(cam2world) @ pad_poses(poses))


def generate_spiral_path(
    poses: np.ndarray, bounds: np.ndarray, n_frames=120, n_rots=2, zrate=0.5
) -> np.ndarray:
    """Forward-facing spiral (`utils/pose_utils.py:486-510`)."""
    close_depth, inf_depth = bounds.min() * 0.9, bounds.max() * 5.0
    dt = 0.75
    focal = 1 / ((1 - dt) / close_depth + dt / inf_depth)

    positions = poses[:, :3, 3]
    radii = np.percentile(np.abs(positions), 90, 0)
    radii = np.concatenate([radii, [1.0]])

    render_poses = []
    cam2world = poses_avg(poses)
    up = poses[:, :3, 1].mean(0)
    for theta in np.linspace(0.0, 2.0 * np.pi * n_rots, n_frames, endpoint=False):
        t = radii * [np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]
        position = cam2world @ t
        lookat = cam2world @ [0, 0, -focal, 1.0]
        z_axis = position - lookat
        render_poses.append(viewmatrix(z_axis, up, position))
    return np.stack(render_poses, axis=0)


def focus_pt_fn(poses: np.ndarray) -> np.ndarray:
    """`utils/pose_utils.py:513-519`."""
    directions, origins = poses[:, :3, 2:3], poses[:, :3, 3:4]
    m = np.eye(3) - directions * np.transpose(directions, [0, 2, 1])
    mt_m = np.transpose(m, [0, 2, 1]) @ m
    return np.linalg.inv(mt_m.mean(0)) @ (mt_m @ origins).mean(0)[:, 0]


def generate_spiral_path_dtu(poses, n_frames=120, n_rots=2, zrate=0.5, perc=60):
    """DTU spiral (`utils/pose_utils.py:522-540`)."""
    positions = poses[:, :3, 3]
    radii = np.percentile(np.abs(positions), perc, 0)
    radii = np.concatenate([radii, [1.0]])
    render_poses = []
    cam2world = poses_avg(poses)
    up = poses[:, :3, 1].mean(0)
    z_axis = focus_pt_fn(poses)
    for theta in np.linspace(0.0, 2.0 * np.pi * n_rots, n_frames, endpoint=False):
        t = radii * [np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]
        position = cam2world @ t
        render_poses.append(viewmatrix(z_axis, up, position, True))
    return np.stack(render_poses, axis=0)


# LLFF poses_bounds.npy conventions -----------------------------------------

LLFF_FIX_ROTATION = np.array(
    [[0, -1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float32
)


def convert_poses(poses: np.ndarray):
    """[3, 5, N] LLFF pose blocks -> (Rs, tvecs, H, W, focal).

    Matches `utils/pose_utils.py` convert_poses: world-to-camera R/t from the
    camera-to-world 3x4 with hwf column."""
    num = poses.shape[-1]
    Rs, tvecs = [], []
    H, W, fl = poses[0, 4, 0], poses[1, 4, 0], poses[2, 4, 0]
    for i in range(num):
        c2w = np.eye(4)
        c2w[:3, :4] = poses[:3, :4, i]
        w2c = np.linalg.inv(c2w)
        Rs.append(w2c[:3, :3])
        tvecs.append(w2c[:3, 3])
    return Rs, tvecs, int(H), int(W), fl


def load_llff_spiral_poses(basedir: str, n_frames: int = 180):
    """The pose pipeline of `CreateLLFFSpiral`
    (`scene/dataset_readers.py:659-704`): poses_bounds.npy -> fix rotation ->
    recenter -> spiral -> backcenter -> unfix rotation -> reattach hwf."""
    poses_arr = np.load(os.path.join(basedir, "poses_bounds.npy"))
    poses_o = poses_arr[:, :-2].reshape([-1, 3, 5])
    bounds = poses_arr[:, -2:]

    inv_rotation = np.linalg.inv(LLFF_FIX_ROTATION)
    poses = poses_o[:, :3, :4] @ LLFF_FIX_ROTATION

    render_poses = recenter_poses(poses)
    render_poses = generate_spiral_path(render_poses, bounds, n_frames=n_frames)
    render_poses = backcenter_poses(render_poses, poses)
    render_poses = render_poses @ inv_rotation
    render_poses = np.concatenate(
        [render_poses, np.tile(poses_o[:1, :3, 4:], (render_poses.shape[0], 1, 1))], -1
    )
    return render_poses.transpose([1, 2, 0])  # [3, 5, F]
