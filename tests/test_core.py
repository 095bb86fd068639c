"""Core math parity tests against the reference implementation (imported as
an oracle from /root/reference, not copied)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from tests import reference_oracle  # noqa: F401  (sys.path side effect)
from utils import sh_utils as ref_sh
from utils import graphics_utils as ref_graphics
from utils import general_utils as ref_general

from scgaussian_tpu.core import sh, transforms, cameras, schedules


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_eval_sh_matches_reference(deg):
    rng = np.random.default_rng(0)
    n = 64
    coeffs = rng.normal(size=(n, 3, 25)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    ours = np.asarray(sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs)))
    ref = ref_sh.eval_sh(deg, torch.from_numpy(coeffs), torch.from_numpy(dirs)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(1).uniform(size=(10, 3)).astype(np.float32))
    np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, rtol=1e-6)
    ref = ref_sh.RGB2SH(torch.from_numpy(np.asarray(rgb)))
    np.testing.assert_allclose(np.asarray(sh.rgb_to_sh(rgb)), ref.numpy(), rtol=1e-6)


def test_quat_to_rotmat_properties():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    R = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q)))
    # orthonormal, det +1
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # identity quat
    Rid = np.asarray(transforms.quat_to_rotmat(jnp.asarray([[1.0, 0, 0, 0]])))
    np.testing.assert_allclose(Rid[0], np.eye(3), atol=1e-6)
    # known 90-degree rotation about z: q = (cos45, 0, 0, sin45)
    s = np.sin(np.pi / 4)
    Rz = np.asarray(transforms.quat_to_rotmat(jnp.asarray([[np.cos(np.pi / 4), 0, 0, s]])))
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(Rz[0], expect, atol=1e-6)


def test_covariance_psd_and_strip():
    rng = np.random.default_rng(3)
    s = np.exp(rng.normal(size=(16, 3)).astype(np.float32) * 0.3)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    cov = np.asarray(
        transforms.covariance_from_scaling_rotation(jnp.asarray(s), 1.0, jnp.asarray(q))
    )
    np.testing.assert_allclose(cov, np.swapaxes(cov, -1, -2), atol=1e-6)
    eig = np.linalg.eigvalsh(cov)
    assert (eig > 0).all()
    six = transforms.strip_symmetric(jnp.asarray(cov))
    back = np.asarray(transforms.unpack_symmetric(six))
    np.testing.assert_allclose(back, cov, atol=1e-7)


def test_world_to_view_matches_reference():
    rng = np.random.default_rng(4)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q[None].astype(np.float32))))[0]
    t = rng.normal(size=3).astype(np.float32)
    ours = cameras.world_to_view(R, t, translate=np.array([0.1, -0.2, 0.3]), scale=1.7)
    ref = ref_graphics.getWorld2View2(R, t, translate=np.array([0.1, -0.2, 0.3]), scale=1.7)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_projection_matrix_matches_reference():
    ours = cameras.projection_matrix(0.01, 100.0, 0.8, 0.6)
    ref = ref_graphics.getProjectionMatrix(znear=0.01, zfar=100.0, fovX=0.8, fovY=0.6).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_fov_focal_roundtrip():
    assert cameras.fov2focal(cameras.focal2fov(500.0, 800), 800) == pytest.approx(500.0)
    assert cameras.fov2focal(0.9, 640) == pytest.approx(ref_graphics.fov2focal(0.9, 640))


def test_expon_lr_matches_reference():
    ref_fn = ref_general.get_expon_lr_func(
        lr_init=1.6e-4, lr_final=1.6e-6, lr_delay_mult=0.01, max_steps=2000
    )
    ours_fn = schedules.expon_lr(
        lr_init=1.6e-4, lr_final=1.6e-6, lr_delay_mult=0.01, max_steps=2000
    )
    for step in [0, 1, 250, 1000, 1999, 2000, 3000]:
        np.testing.assert_allclose(float(ours_fn(step)), ref_fn(step), rtol=1e-4)
    # delayed variant
    ref_fn2 = ref_general.get_expon_lr_func(1e-3, 1e-5, lr_delay_steps=100, lr_delay_mult=0.1, max_steps=1000)
    ours_fn2 = schedules.expon_lr(1e-3, 1e-5, lr_delay_steps=100, lr_delay_mult=0.1, max_steps=1000)
    for step in [0, 10, 50, 100, 500, 1000]:
        np.testing.assert_allclose(float(ours_fn2(step)), ref_fn2(step), rtol=1e-4)


def test_camera_pytree():
    R = np.eye(3)
    T = np.zeros(3)
    cam = cameras.Camera.create(R, T, fovx=0.9, fovy=0.7, width=64, height=48)
    assert cam.width == 64 and cam.height == 48
    # camera at origin looking +z
    np.testing.assert_allclose(np.asarray(cam.cam_center), np.zeros(3), atol=1e-6)
    # full_proj = proj @ world_view
    np.testing.assert_allclose(
        np.asarray(cam.full_proj),
        cameras.projection_matrix(0.01, 100.0, 0.9, 0.7) @ np.asarray(cam.world_view),
        rtol=1e-5,
    )
    import jax

    leaves = jax.tree_util.tree_leaves(cam)
    assert all(hasattr(l, "shape") for l in leaves)
