"""Shared synthetic 'scene in a box' fixture: known Gaussians, V cameras,
oracle-rendered GT images, perfect matches from the Gaussian centers
(SURVEY.md section 4, integration-test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp

from scgaussian_tpu.core.cameras import Camera
from scgaussian_tpu.core.cameras import intrinsic_matrix, world_to_view
from scgaussian_tpu.renderer import render
from scgaussian_tpu.model.matches import build_match_bundle


def make_synthetic(V=3, K=40, W=64, H=48, fov=0.9, seed=0):
    rng = np.random.default_rng(seed)

    # ground-truth Gaussians in a box in front of the cameras
    centers = np.stack(
        [rng.uniform(-0.8, 0.8, K), rng.uniform(-0.6, 0.6, K), rng.uniform(3.0, 5.0, K)],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(rng.uniform(-2.7, -2.0, (K, 3))).astype(np.float32)
    quats = rng.normal(size=(K, 4)).astype(np.float32)
    opac = rng.uniform(0.6, 0.95, K).astype(np.float32)
    shs = np.zeros((K, 16, 3), np.float32)
    shs[:, 0] = rng.uniform(-0.8, 0.8, (K, 3))

    # cameras: identity rotation, small translational baseline
    ts = [np.array([0.0, 0, 0]), np.array([0.35, 0, 0]), np.array([0.0, 0.35, 0])][:V]
    Rs = [np.eye(3)] * V
    cams = [Camera.create(R, t, fov, fov, W, H) for R, t in zip(Rs, ts)]

    gts = []
    for cam in cams:
        out = render(
            cam,
            jnp.asarray(centers),
            jnp.asarray(opac),
            jnp.zeros(3),
            scales=jnp.asarray(scales),
            rotations=jnp.asarray(quats),
            shs=jnp.asarray(shs),
            active_sh_degree=3,
            backend="oracle",
        )
        gts.append(jnp.clip(out.render, 0.0, 1.0))

    # perfect matches: project Gaussian centers into each view
    intrs = [intrinsic_matrix(fov, fov, W, H) for _ in range(V)]
    w2cs = [world_to_view(R, t) for R, t in zip(Rs, ts)]

    def project(v, X):
        cam_pts = X @ w2cs[v][:3, :3].T + w2cs[v][:3, 3]
        uvz = cam_pts @ intrs[v].T
        return uvz[:, :2] / uvz[:, 2:3]

    match_pixels = {}
    for i in range(V):
        uv_i = project(i, centers)
        norm = uv_i / np.array([W, H])
        inb = ((norm > 0.05) & (norm < 0.95)).all(axis=1)
        for j in range(V):
            if i != j:
                uv_j = project(j, centers)
                norm_j = uv_j / np.array([W, H])
                ok = inb & ((norm_j > 0.05) & (norm_j < 0.95)).all(axis=1)
                match_pixels[(i, j)] = norm[ok].astype(np.float32)

    # make pairs symmetric row-for-row: recompute with joint mask
    match_pixels = {}
    true_z = {}
    for i in range(V):
        for j in range(i + 1, V):
            ni = project(i, centers) / np.array([W, H])
            nj = project(j, centers) / np.array([W, H])
            ok = ((ni > 0.05) & (ni < 0.95)).all(axis=1) & (
                (nj > 0.05) & (nj < 0.95)
            ).all(axis=1)
            match_pixels[(i, j)] = ni[ok].astype(np.float32)
            match_pixels[(j, i)] = nj[ok].astype(np.float32)
            kept = centers[ok]
            for v, key in ((i, (i, j)), (j, (j, i))):
                cam_center = np.linalg.inv(w2cs[v])[:3, 3]
                true_z[key] = np.linalg.norm(kept - cam_center[None], axis=-1)

    images_np = [np.asarray(g).transpose(1, 2, 0) for g in gts]
    near_fars = [np.array([1.5, 8.0], np.float32)] * V
    bundle = build_match_bundle(images_np, intrs, w2cs, near_fars, match_pixels)

    return dict(
        centers=centers,
        cams=cams,
        gts=gts,
        bundle=bundle,
        w2cs=w2cs,
        intrs=intrs,
        match_pixels=match_pixels,
        true_z=true_z,
        W=W,
        H=H,
    )
