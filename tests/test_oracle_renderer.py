"""Semantic tests of the dense oracle rasterizer (projection + compositing).

The oracle is the spec for the Pallas kernels; these tests pin its behavior to
the CUDA renderer semantics (see renderer/oracle.py docstring)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scgaussian_tpu.core.cameras import Camera
from scgaussian_tpu.renderer import render
from scgaussian_tpu.renderer import project as project_mod
from scgaussian_tpu.renderer import oracle as oracle_mod


def make_camera(width=64, height=48, fov=0.8):
    return Camera.create(np.eye(3), np.zeros(3), fovx=fov, fovy=fov, width=width, height=height)


def make_scene(n=32, seed=0, z_range=(2.0, 6.0), opacity_range=(0.3, 0.9), spread=1.0):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread, spread, n),
            rng.uniform(*z_range, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(rng.uniform(-3.0, -1.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(*opacity_range, n).astype(np.float32)
    shs = np.zeros((n, 16, 3), dtype=np.float32)
    shs[:, 0, :] = rng.uniform(-1.0, 1.0, (n, 3))
    shs[:, 1:, :] = rng.normal(size=(n, 15, 3)) * 0.05
    return (
        jnp.asarray(means),
        jnp.asarray(scales),
        jnp.asarray(quats),
        jnp.asarray(opac),
        jnp.asarray(shs),
    )


def render_oracle(cam, means, scales, quats, opac, shs, bg=None, deg=3, **kw):
    if bg is None:
        bg = jnp.zeros(3)
    return render(
        cam,
        means,
        opac,
        bg,
        scales=scales,
        rotations=quats,
        shs=shs,
        active_sh_degree=deg,
        backend="oracle",
        **kw,
    )


def test_projection_center_and_depth():
    cam = make_camera(64, 48)
    means = jnp.asarray([[0.0, 0.0, 4.0]])
    proj = project_mod.project(
        cam,
        means,
        jnp.asarray([0.8]),
        scales=jnp.asarray([[0.05, 0.05, 0.05]]),
        rotations=jnp.asarray([[1.0, 0, 0, 0]]),
        colors_precomp=jnp.asarray([[1.0, 0, 0]]),
    )
    # on-axis point projects to ndc 0 -> pixel (S-1)/2
    np.testing.assert_allclose(np.asarray(proj.mean2d[0]), [(64 - 1) / 2, (48 - 1) / 2], atol=1e-3)
    np.testing.assert_allclose(float(proj.depth[0]), 4.0, rtol=1e-6)
    assert bool(proj.valid[0])
    # isotropic gaussian on axis: cov2d = (f*s/z)^2 + 0.3, radius = ceil(3*sqrt(that))
    f = 64 / (2 * float(cam.tanfovx))
    expected_var = (f * 0.05 / 4.0) ** 2 + 0.3
    expected_radius = np.ceil(3 * np.sqrt(expected_var))
    assert int(proj.radius[0]) == int(expected_radius)


def test_near_culling():
    cam = make_camera()
    means = jnp.asarray([[0.0, 0.0, 0.1], [0.0, 0.0, 3.0]])
    proj = project_mod.project(
        cam,
        means,
        jnp.asarray([0.8, 0.8]),
        scales=jnp.full((2, 3), 0.05),
        rotations=jnp.asarray([[1.0, 0, 0, 0]] * 2),
        colors_precomp=jnp.ones((2, 3)),
    )
    assert not bool(proj.valid[0])  # z=0.1 < 0.2 near cull
    assert int(proj.radius[0]) == 0
    assert bool(proj.valid[1])


def test_single_gaussian_center_alpha():
    """At the Gaussian center, power=0 => alpha=opacity; color = a*c + (1-a)*bg."""
    cam = make_camera(63, 47)  # odd sizes -> integer center pixel (S-1)/2
    op = 0.7
    out = render(
        cam,
        jnp.asarray([[0.0, 0.0, 4.0]]),
        jnp.asarray([op]),
        jnp.asarray([0.0, 0.0, 1.0]),
        scales=jnp.asarray([[0.08, 0.08, 0.08]]),
        rotations=jnp.asarray([[1.0, 0, 0, 0]]),
        colors_precomp=jnp.asarray([[1.0, 0.5, 0.0]]),
        backend="oracle",
    )
    cy, cx = (47 - 1) // 2, (63 - 1) // 2
    px = np.asarray(out.render)[:, cy, cx]
    np.testing.assert_allclose(px, [op * 1.0, op * 0.5, (1 - op) * 1.0], atol=1e-5)
    np.testing.assert_allclose(float(out.rendered_alpha[0, cy, cx]), op, atol=1e-5)
    np.testing.assert_allclose(float(out.rendered_depth[0, cy, cx]), op * 4.0, atol=1e-4)


def test_occlusion_ordering():
    """A front opaque Gaussian must occlude a back one regardless of array order."""
    cam = make_camera(63, 47)
    scales = jnp.full((2, 3), 0.1)
    quats = jnp.asarray([[1.0, 0, 0, 0]] * 2)
    opac = jnp.asarray([0.95, 0.95])
    colors = jnp.asarray([[1.0, 0, 0], [0.0, 1.0, 0]])  # red at z=2 (front), green z=5
    means_fb = jnp.asarray([[0, 0, 2.0], [0, 0, 5.0]])
    means_bf = means_fb[::-1]

    def go(means, cols):
        return render(
            cam, means, opac, jnp.zeros(3), scales=scales, rotations=quats,
            colors_precomp=cols, backend="oracle",
        )

    out1 = go(means_fb, colors)
    out2 = go(means_bf, colors[::-1])
    np.testing.assert_allclose(np.asarray(out1.render), np.asarray(out2.render), atol=1e-6)
    cy, cx = (47 - 1) // 2, (63 - 1) // 2
    px = np.asarray(out1.render)[:, cy, cx]
    # front red contributes 0.95, back green only 0.05*0.95
    assert px[0] > 0.9
    assert px[1] < 0.06


def test_early_termination_transmittance_floor():
    """Stacked opaque Gaussians: compositing stops once T would drop below 1e-4,
    so accumulated alpha stays <= 1 - 1e-4 * (1 - 0.99)... bounded below 1."""
    cam = make_camera(31, 31)
    n = 16
    means = jnp.asarray([[0.0, 0.0, 2.0 + 0.1 * i] for i in range(n)])
    out = render(
        cam,
        means,
        jnp.full((n,), 1.0),  # sigmoid-activated would cap at <1; raw 1.0 -> alpha capped 0.99
        jnp.zeros(3),
        scales=jnp.full((n, 3), 0.5),
        rotations=jnp.asarray([[1.0, 0, 0, 0]] * n),
        colors_precomp=jnp.ones((n, 3)),
        backend="oracle",
    )
    alpha = np.asarray(out.rendered_alpha)
    assert alpha.max() <= 1.0 - 1e-4 + 1e-6
    # center pixel: each splat has alpha 0.99. In fp32, (1-0.99f)^2 =
    # 9.99998e-5 < 1e-4, so the SECOND splat already crosses the CUDA
    # transmittance cutoff and is excluded: only one splat composites.
    cx = (31 - 1) // 2
    np.testing.assert_allclose(alpha[0, cx, cx], 0.99, atol=1e-6)


def test_tile_truncation():
    """Contributions are cut at tile granularity outside the Gaussian's rect."""
    cam = make_camera(64, 64)
    # small radius gaussian centered in tile (1,1)
    out = render(
        cam,
        jnp.asarray([[0.0, 0.0, 8.0]]),
        jnp.asarray([0.9]),
        jnp.zeros(3),
        scales=jnp.full((1, 3), 0.01),
        rotations=jnp.asarray([[1.0, 0, 0, 0]]),
        colors_precomp=jnp.ones((1, 3)),
        backend="oracle",
        tile=16,
    )
    img = np.asarray(out.render)[0]
    proj = project_mod.project(
        cam,
        jnp.asarray([[0.0, 0.0, 8.0]]),
        jnp.asarray([0.9]),
        scales=jnp.full((1, 3), 0.01),
        rotations=jnp.asarray([[1.0, 0, 0, 0]]),
        colors_precomp=jnp.ones((1, 3)),
    )
    rmin, rmax = project_mod.tile_rect(proj.mean2d, proj.radius, 64, 64, 16)
    rmin, rmax = np.asarray(rmin)[0], np.asarray(rmax)[0]
    ys, xs = np.nonzero(img > 0)
    assert len(xs) > 0
    assert (xs // 16 >= rmin[0]).all() and (xs // 16 < rmax[0]).all()
    assert (ys // 16 >= rmin[1]).all() and (ys // 16 < rmax[1]).all()


def test_background_compositing():
    cam = make_camera(32, 32)
    bg = jnp.asarray([0.2, 0.4, 0.6])
    out = render(
        cam,
        jnp.asarray([[10.0, 10.0, 5.0]]),  # far off screen
        jnp.asarray([0.9]),
        bg,
        scales=jnp.full((1, 3), 0.01),
        rotations=jnp.asarray([[1.0, 0, 0, 0]]),
        colors_precomp=jnp.ones((1, 3)),
        backend="oracle",
    )
    img = np.asarray(out.render)
    np.testing.assert_allclose(img, np.broadcast_to(np.asarray(bg)[:, None, None], img.shape), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.rendered_alpha), 0.0, atol=1e-7)


def test_oracle_gradcheck_smooth_region():
    """Finite-difference check of d(sum image)/d(params) in a smooth regime
    (no threshold crossings): moderate opacities, no early termination."""
    cam = make_camera(32, 32)
    means, scales, quats, opac, shs = make_scene(n=6, seed=7, opacity_range=(0.4, 0.6))

    def loss_fn(means, scales, opac):
        out = render(
            cam, means, opac, jnp.asarray([0.1, 0.1, 0.1]),
            scales=scales, rotations=quats, shs=shs, active_sh_degree=2,
            backend="oracle", tile=0,  # disable tile truncation: smooth regime
        )
        return jnp.sum(out.render * out.render) + 0.1 * jnp.sum(out.rendered_depth)

    g_means, g_scales, g_opac = jax.grad(loss_fn, argnums=(0, 1, 2))(means, scales, opac)

    rng = np.random.default_rng(3)
    for arr, g, name in [(means, g_means, "means"), (scales, g_scales, "scales"), (opac, g_opac, "opac")]:
        flat = np.asarray(arr).ravel()
        gflat = np.asarray(g).ravel()
        idxs = rng.choice(flat.size, size=min(5, flat.size), replace=False)
        for i in idxs:
            eps = 1e-3 if name != "scales" else 1e-4
            fp = flat.copy(); fp[i] += eps
            fm = flat.copy(); fm[i] -= eps
            args_p = [means, scales, opac]
            args_m = [means, scales, opac]
            pos = {"means": 0, "scales": 1, "opac": 2}[name]
            args_p[pos] = jnp.asarray(fp.reshape(np.asarray(arr).shape))
            args_m[pos] = jnp.asarray(fm.reshape(np.asarray(arr).shape))
            fd = (float(loss_fn(*args_p)) - float(loss_fn(*args_m))) / (2 * eps)
            ad = float(gflat[i])
            assert abs(fd - ad) <= 2e-2 * max(1.0, abs(fd), abs(ad)), (
                f"{name}[{i}]: fd={fd} ad={ad}"
            )


def test_mean2d_offset_gradient():
    """The viewspace-gradient hook: grads flow to mean2d_offset (the JAX
    equivalent of the reference's screenspace_points.grad harvest,
    gaussian_renderer/__init__.py:27-32)."""
    cam = make_camera(32, 32)
    means, scales, quats, opac, shs = make_scene(n=4, seed=11)
    offset = jnp.zeros((4, 2))

    def loss_fn(off):
        out = render(
            cam, means, opac, jnp.zeros(3), scales=scales, rotations=quats,
            shs=shs, active_sh_degree=0, mean2d_offset=off, backend="oracle",
        )
        return jnp.sum(out.render**2)

    g = jax.grad(loss_fn)(offset)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def _rotmat(axis, angle):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def test_projection_rotated_camera_matches_manual():
    """Non-identity camera rotation/translation: mean2d must equal the manual
    K @ w2c pinhole projection in the reference ndc2pix convention
    (pixel = (ndc + 1) * S / 2 - 0.5)."""
    from scgaussian_tpu.core.cameras import Camera, intrinsic_matrix, world_to_view

    # COLMAP-style inputs: R is the transposed w2c rotation, T the w2c translation
    Rw2c = _rotmat([0.3, 1.0, 0.2], 0.4)
    R = Rw2c.T
    T = np.array([0.2, -0.1, 0.5])
    W, H = 64, 48
    cam = Camera.create(R, T, fovx=0.9, fovy=0.7, width=W, height=H)

    rng = np.random.default_rng(0)
    # points in front of this camera: x_cam = Rw2c x + T with z in (2, 6)
    cam_pts = np.stack(
        [rng.uniform(-0.5, 0.5, 20), rng.uniform(-0.4, 0.4, 20), rng.uniform(2, 6, 20)],
        -1,
    )
    world_pts = (cam_pts - T) @ np.linalg.inv(Rw2c).T

    proj = project_mod.project(
        cam,
        jnp.asarray(world_pts.astype(np.float32)),
        jnp.full((20,), 0.5),
        scales=jnp.full((20, 3), 0.05),
        rotations=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (20, 1)),
        colors_precomp=jnp.ones((20, 3)),
    )
    K = intrinsic_matrix(0.9, 0.7, W, H)
    uvz = cam_pts @ K.T
    uv = uvz[:, :2] / uvz[:, 2:3]
    # reference convention: pixel = (ndc+1)*S/2 - 0.5 = K-projection - 0.5
    np.testing.assert_allclose(np.asarray(proj.mean2d), uv - 0.5, atol=2e-2)
    np.testing.assert_allclose(np.asarray(proj.depth), cam_pts[:, 2], rtol=1e-5)


def test_backend_parity_rotated_camera():
    """Oracle vs Pallas parity under a rotated + translated camera."""
    Rw2c = _rotmat([1.0, 0.5, -0.3], -0.35)
    cam = Camera.create(Rw2c.T, np.array([0.1, 0.2, -0.3]), 0.85, 0.65, 64, 48)
    means, scales, quats, opac, shs = make_scene(n=48, seed=21, z_range=(2.5, 7.0))
    # push points into this camera's frustum: transform from cam frame
    rng = np.random.default_rng(5)
    cam_pts = np.stack(
        [rng.uniform(-1, 1, 48), rng.uniform(-0.8, 0.8, 48), rng.uniform(2.5, 7, 48)], -1
    )
    world = (cam_pts - np.array([0.1, 0.2, -0.3])) @ np.linalg.inv(Rw2c).T
    means = jnp.asarray(world.astype(np.float32))

    outs = {}
    for backend in ("oracle", "tpu"):
        outs[backend] = render(
            cam, means, opac, jnp.asarray([0.2, 0.1, 0.4]), scales=scales,
            rotations=quats, shs=shs, active_sh_degree=3, backend=backend,
        )
    np.testing.assert_allclose(
        np.asarray(outs["tpu"].render), np.asarray(outs["oracle"].render), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(outs["tpu"].rendered_depth),
        np.asarray(outs["oracle"].rendered_depth),
        atol=2e-4,
    )
