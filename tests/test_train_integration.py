"""Integration tests on the synthetic scene (SURVEY.md section 4 item 3):
init stage recovers true ray depths; main-stage training improves the
photometric loss; densification invariants hold."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scgaussian_tpu.config import OptimizationConfig, TrainExtras
from scgaussian_tpu.model import matches as mm
from scgaussian_tpu.model.gaussians import create_model
from scgaussian_tpu.train import pipeline
from scgaussian_tpu.losses import l1_loss
from scgaussian_tpu.train.main_stage import render_model, dtu_background_mask

from tests.synthetic_scene import make_synthetic


@pytest.fixture(scope="module")
def scene():
    return make_synthetic()


def test_init_stage_recovers_depth(scene):
    bundle = scene["bundle"]
    z0 = mm.init_zvals(bundle, jax.random.key(0))
    res = mm.run_init_stage(bundle, z0, iterations=500)

    # compare best_z to the true ray depth per ordered pair
    pair_list = [(i, j) for i in range(3) for j in range(3) if j != i]
    best_z = np.asarray(res.best_z)
    pad_valid = np.asarray(bundle.pad_valid)
    errs = []
    for k, key in enumerate(pair_list):
        tz = scene["true_z"][key]
        m = tz.shape[0]
        assert pad_valid[k, :m].all()
        errs.append(np.abs(best_z[k, :m] - tz))
    err = np.concatenate(errs)
    # matches are exact projections of true points -> z must converge tightly
    assert np.median(err) < 0.02, f"median depth error {np.median(err)}"
    assert float(res.final_loss) < 0.05

    min_err = np.asarray(res.min_err)
    assert np.median(min_err[pad_valid]) < 1e-3


def test_promote_and_model_shapes(scene):
    bundle = scene["bundle"]
    z0 = mm.init_zvals(bundle, jax.random.key(0))
    res = mm.run_init_stage(bundle, z0, iterations=300)
    rayo, rayd, z, color = mm.promote_matches(
        bundle, np.asarray(res.best_z), np.asarray(res.min_err)
    )
    assert rayo.shape[0] > 0
    model = create_model(rayo, rayd, z, color, 3, 1.0, bg_capacity=512)
    n = model.total
    assert model.num_ray == rayo.shape[0]
    assert model.get_xyz().shape == (n, 3)
    assert model.get_features().shape == (n, 16, 3)
    # fg xyz respects the ray constraint
    np.testing.assert_allclose(
        np.asarray(model.get_xyz()[: model.num_ray]),
        rayo + rayd * z.reshape(-1, 1),
        rtol=1e-5,
        atol=1e-5,
    )
    # dead bg slots are fully transparent
    assert float(model.get_opacity()[model.num_ray :].max()) == 0.0


def test_main_stage_improves_loss(scene):
    bundle = scene["bundle"]
    model, _res = pipeline.setup_from_matches(
        bundle,
        jax.random.key(1),
        sh_degree=3,
        spatial_lr_scale=1.0,
        extras=TrainExtras(bg_capacity=512, init_iterations=300),
    )
    cams = scene["cams"]
    gts = scene["gts"]

    def initial_l1():
        tot = 0.0
        for cam, gt in zip(cams, gts):
            out = render_model(cam, model, jnp.zeros(3), backend="oracle")
            tot += float(l1_loss(jnp.clip(out.render, 0, 1), gt))
        return tot / len(cams)

    l1_before = initial_l1()

    opt_cfg = OptimizationConfig(iterations=60, densify_from_iter=10_000)
    state = pipeline.run_main_stage(
        model,
        bundle,
        cams,
        gts,
        view_ids=list(range(len(cams))),
        rng=jax.random.key(2),
        opt_cfg=opt_cfg,
        extras=TrainExtras(bg_capacity=512),
        backend="oracle",
        iterations=60,
    )

    tot = 0.0
    for cam, gt in zip(cams, gts):
        out = render_model(cam, state.model, jnp.zeros(3), backend="oracle")
        tot += float(l1_loss(jnp.clip(out.render, 0, 1), gt))
    l1_after = tot / len(cams)
    assert l1_after < l1_before, (l1_before, l1_after)
    # fg count must never change (`scene/gaussian_model.py:893,927`)
    assert state.model.num_ray == model.num_ray


def test_dtu_background_mask_semantics():
    """Row-causal dark mask: replicate the reference's shift loop
    (`train.py:149-158`) directly and compare."""
    rng = np.random.default_rng(0)
    gt = rng.uniform(size=(3, 80, 12)).astype(np.float32)
    gt[:, :60] = 0.01  # dark block
    thr = 30 / 255
    ours = np.asarray(dtu_background_mask(jnp.asarray(gt), thr, 50))[0]

    bg = (gt.max(0, keepdims=True) < thr).copy()
    clone = bg.copy()
    for i in range(1, 50):
        bg[:, i:] = bg[:, i:] * clone[:, :-i]
    np.testing.assert_array_equal(ours, bg[0].astype(bool))


def test_pipeline_debug_paths_match(scene):
    """convert_SHs_python / compute_cov3D_python produce identical renders
    (the reference's rasterizer-stage oracles, PipelineParams)."""
    bundle = scene["bundle"]
    model, _ = pipeline.setup_from_matches(
        bundle, jax.random.key(3), 3, 1.0,
        extras=TrainExtras(bg_capacity=128, init_iterations=100),
    )
    cam = scene["cams"][0]
    base = render_model(cam, model, jnp.zeros(3), backend="oracle")
    for kwargs in (
        dict(convert_shs_python=True),
        dict(compute_cov3d_python=True),
        dict(convert_shs_python=True, compute_cov3d_python=True),
    ):
        out = render_model(cam, model, jnp.zeros(3), backend="oracle", **kwargs)
        np.testing.assert_allclose(
            np.asarray(out.render), np.asarray(base.render), atol=1e-5,
        )
