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


def test_dtu_training_end_to_end(scene):
    """DTU protocol end-to-end (VERDICT round-3 weak #4): dark-background
    GT through run_main_stage(is_dtu=True) — masked loss decreases, the
    background-alpha penalty (`train.py:167-168`) has nonzero gradient and
    actively drives bg alpha down, and the white-composite metrics path
    (`metrics.py:36-44` analog) runs on the result."""
    import dataclasses

    from scgaussian_tpu.config import RasterizerConfig
    from scgaussian_tpu.eval.metrics import compute_image_metrics
    from scgaussian_tpu.train.main_stage import make_camera_loss

    bundle = scene["bundle"]
    extras = TrainExtras(bg_capacity=256, init_iterations=150)
    model, _ = pipeline.setup_from_matches(bundle, jax.random.key(1), 3, 1.0, extras=extras)

    # DTU-like GT: brighten the object region (the synthetic GT's empty
    # background is black, which the dark mask would also catch), then make
    # the left 28 columns dark top-to-bottom -> the row-causal dark mask
    # marks exactly those columns as background (columns 18-27 carry splat
    # alpha at init, so the penalty has something to push down)
    cams = scene["cams"]
    gts = [0.3 + 0.7 * np.asarray(g) for g in scene["gts"]]
    for g in gts:
        g[:, :, :28] = 0.003
    gts = [jnp.asarray(g) for g in gts]
    bg_mask0 = dtu_background_mask(gts[0], extras.dtu_dark_threshold, extras.dtu_shift_rows)
    assert bool(bg_mask0[0, :, :28].all()) and not bool(bg_mask0[0, :, 28:].any())

    # 1. the alpha penalty term alone has nonzero opacity gradient on bg
    def penalty(params):
        m = dataclasses.replace(model, params=params)
        out = render_model(cams[0], m, jnp.zeros(3), backend="oracle")
        return jnp.sum(out.rendered_alpha * bg_mask0) / jnp.maximum(jnp.sum(bg_mask0), 1)

    g = jax.grad(penalty)(model.params)
    assert float(jnp.abs(g.opacity).sum()) > 0
    assert float(jnp.abs(g.zval).sum()) >= 0  # flows through the hybrid params

    # 2. the full DTU loss == plain loss + penalty on the masked gt
    loss_dtu = make_camera_loss(
        model, bundle, cams[0], gts[0], jnp.int32(0), jnp.zeros(3),
        OptimizationConfig(), RasterizerConfig(), extras, "oracle", True,
    )(model.params, jnp.zeros((model.total, 2)))[0]
    gt_masked = jnp.where(bg_mask0, 0.0, gts[0])
    loss_plain = make_camera_loss(
        model, bundle, cams[0], gt_masked, jnp.int32(0), jnp.zeros(3),
        OptimizationConfig(), RasterizerConfig(), extras, "oracle", False,
    )(model.params, jnp.zeros((model.total, 2)))[0]
    np.testing.assert_allclose(
        float(loss_dtu), float(loss_plain + penalty(model.params)), rtol=1e-6
    )

    # 3. end-to-end: N steps of DTU training reduce the loss, and the alpha
    # penalty leaves bg alpha LOWER than the identical run without it
    # (comparing against plain training isolates the penalty causally —
    # densification confounds a before/after comparison)
    losses = []

    def cb(iteration, m, metrics, opt_state=None, **kw):
        losses.append(float(metrics.loss))

    opt_cfg = OptimizationConfig(
        iterations=50, densify_from_iter=10, densification_interval=20,
        densify_until_iter=100, opacity_reset_interval=10_000,
    )
    state = pipeline.run_main_stage(
        model, bundle, cams, gts, view_ids=[0, 1, 2], rng=jax.random.key(0),
        opt_cfg=opt_cfg, extras=extras, backend="oracle", is_dtu=True,
        iterations=50, callback=cb,
    )
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    out_after = render_model(cams[0], state.model, jnp.zeros(3), backend="oracle")
    alpha_dtu = float(jnp.mean(out_after.rendered_alpha * bg_mask0))

    state_plain = pipeline.run_main_stage(
        model, bundle, cams, gts, view_ids=[0, 1, 2], rng=jax.random.key(0),
        opt_cfg=opt_cfg, extras=extras, backend="oracle", is_dtu=False,
        iterations=50,
    )
    out_plain = render_model(cams[0], state_plain.model, jnp.zeros(3), backend="oracle")
    alpha_plain = float(jnp.mean(out_plain.rendered_alpha * bg_mask0))
    assert alpha_dtu < alpha_plain, (alpha_dtu, alpha_plain)

    # 4. white-composite metrics path (render*mask + (1-mask)) on the result
    mask = (~np.asarray(bg_mask0)[0]).astype(np.float32)[None].repeat(3, 0)
    render_np = np.clip(np.asarray(out_after.render), 0, 1)
    gt_np = np.asarray(gts[0])
    m = compute_image_metrics(
        render_np * mask + (1 - mask), gt_np * mask + (1 - mask), mask == 1.0
    )
    assert np.isfinite(m["PSNR"]) and 0 <= m["SSIM"] <= 1 and m["AVG"] > 0


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
