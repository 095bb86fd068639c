"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md section 4
item 4): data-parallel step correctness vs the single-device program."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scgaussian_tpu.config import OptimizationConfig, RasterizerConfig, TrainExtras
from scgaussian_tpu.parallel import dp
from scgaussian_tpu.train import optim, pipeline
from scgaussian_tpu.losses import l1_loss, ssim
from scgaussian_tpu.model.matches import matchloss_from_renderdepth
from scgaussian_tpu.train.main_stage import lr_tree, render_model

from tests.synthetic_scene import make_synthetic


@pytest.fixture(scope="module")
def setup():
    scene = make_synthetic(V=3, K=24, W=48, H=32)
    model, _ = pipeline.setup_from_matches(
        scene["bundle"], jax.random.key(0), 3, 1.0,
        extras=TrainExtras(bg_capacity=128, init_iterations=100),
    )
    return scene, model


def test_dp_step_matches_single_device(setup):
    """8 devices all rendering the SAME camera must produce exactly the
    single-device gradient (pmean of identical grads)."""
    scene, model = setup
    assert len(jax.devices()) == 8
    mesh = dp.make_mesh(8)
    bundle = scene["bundle"]
    opt_cfg = OptimizationConfig()
    extras = TrainExtras(bg_capacity=128)
    raster = RasterizerConfig(entry_budget=8192)

    cams = dp.stack_cameras([scene["cams"][0]] * 8)
    gts = jnp.stack([scene["gts"][0]] * 8)
    vids = jnp.zeros((8,), jnp.int32)

    opt_state = optim.init(model.params)
    m_dp, o_dp, metrics_dp = dp.dp_train_step(
        mesh, model, opt_state, bundle, cams, gts, vids, jnp.int32(1),
        jnp.zeros(3), opt_cfg, raster=raster, extras=extras, backend="oracle",
    )
    loss_dp = metrics_dp.loss

    # single-device equivalent
    def loss_fn(params):
        m = dataclasses.replace(model, params=params)
        out = render_model(scene["cams"][0], m, jnp.zeros(3), backend="oracle")
        ll1 = l1_loss(out.render, scene["gts"][0])
        loss = 0.8 * ll1 + 0.2 * (1 - ssim(out.render, scene["gts"][0]))
        return loss + 0.3 * matchloss_from_renderdepth(bundle, jnp.int32(0), out.rendered_depth)

    loss_1, grads = jax.value_and_grad(loss_fn)(model.params)
    lrs = lr_tree(model.params, opt_cfg, 1.0, jnp.int32(1))
    params_1, _ = optim.apply(model.params, grads, optim.init(model.params), lrs)

    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(m_dp.params), jax.tree_util.tree_leaves(params_1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_step_different_cameras_runs(setup):
    scene, model = setup
    mesh = dp.make_mesh(8)
    cams = dp.stack_cameras([scene["cams"][i % 3] for i in range(8)])
    gts = jnp.stack([scene["gts"][i % 3] for i in range(8)])
    vids = jnp.asarray([i % 3 for i in range(8)], jnp.int32)
    m2, o2, metrics = dp.dp_train_step(
        mesh, model, optim.init(model.params), scene["bundle"], cams, gts, vids,
        jnp.int32(1), jnp.zeros(3), OptimizationConfig(),
        raster=RasterizerConfig(entry_budget=8192),
        extras=TrainExtras(bg_capacity=128), backend="oracle",
    )
    assert np.isfinite(float(metrics.loss))
    assert int(metrics.overflow) == 0
    # params actually moved
    diff = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(m2.params), jax.tree_util.tree_leaves(model.params)
        )
    )
    assert diff > 0


def test_dp_step_dtu_parity(setup):
    """DTU branch under DP: 8 devices on the same camera == single-device
    train_step(is_dtu=True) — mask, alpha penalty and final-iteration-skip
    all ride the shared make_camera_loss/apply_update."""
    from scgaussian_tpu.train.main_stage import train_step

    scene, model = setup
    mesh = dp.make_mesh(8)
    bundle = scene["bundle"]
    opt_cfg = OptimizationConfig()
    extras = TrainExtras(bg_capacity=128)

    # darken the image bottom so the dark-row DTU mask is non-trivial
    gt = scene["gts"][0] * (jnp.arange(32)[None, :, None] < 20)

    cams = dp.stack_cameras([scene["cams"][0]] * 8)
    gts = jnp.stack([gt] * 8)
    vids = jnp.zeros((8,), jnp.int32)
    opt_state = optim.init(model.params)

    m_dp, o_dp, met_dp = dp.dp_train_step(
        mesh, model, opt_state, bundle, cams, gts, vids, jnp.int32(1),
        jnp.zeros(3), opt_cfg, extras=extras, backend="oracle", is_dtu=True,
    )
    m_1, o_1, met_1 = train_step(
        model, optim.init(model.params), bundle, scene["cams"][0], gt,
        jnp.int32(0), jnp.int32(1), jnp.zeros(3), opt_cfg, extras=extras,
        backend="oracle", is_dtu=True,
    )
    np.testing.assert_allclose(float(met_dp.loss), float(met_1.loss), rtol=1e-5)
    assert int(met_dp.num_visible) == int(met_1.num_visible)
    for a, b in zip(
        jax.tree_util.tree_leaves(m_dp.params), jax.tree_util.tree_leaves(m_1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_step_final_iteration_skip(setup):
    """The reference skips the optimizer on the final iteration
    (`train.py:203`); the DP step must too."""
    scene, model = setup
    mesh = dp.make_mesh(8)
    opt_cfg = OptimizationConfig(iterations=7)
    cams = dp.stack_cameras([scene["cams"][i % 3] for i in range(8)])
    gts = jnp.stack([scene["gts"][i % 3] for i in range(8)])
    vids = jnp.asarray([i % 3 for i in range(8)], jnp.int32)
    m2, _, _ = dp.dp_train_step(
        mesh, model, optim.init(model.params), scene["bundle"], cams, gts,
        vids, jnp.int32(7), jnp.zeros(3), opt_cfg,
        extras=TrainExtras(bg_capacity=128), backend="oracle",
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(m2.params), jax.tree_util.tree_leaves(model.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dp_pipeline_matches_single_device_sequence(setup):
    """run_main_stage(mesh=1-device) == run_main_stage(mesh=None) over the
    SAME rng: identical camera sequence, psums are no-ops, all maintenance
    (densify + opacity reset + guards) sequences identically."""
    scene, model = setup
    opt_cfg = OptimizationConfig(
        iterations=8, densification_interval=4, densify_from_iter=1,
        densify_until_iter=100, opacity_reset_interval=6,
        opacity_reset_until_iter=100,
    )
    kw = dict(
        bundle=scene["bundle"], cameras=scene["cams"], gt_images=scene["gts"],
        view_ids=[0, 1, 2], opt_cfg=opt_cfg,
        extras=TrainExtras(bg_capacity=128), backend="oracle", iterations=8,
    )
    s1 = pipeline.run_main_stage(model, rng=jax.random.key(3), **kw)
    s2 = pipeline.run_main_stage(
        model, rng=jax.random.key(3), mesh=dp.make_mesh(1), **kw
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.model.params),
        jax.tree_util.tree_leaves(s2.model.params),
    ):
        # shard_map changes XLA fusion boundaries, so 8 compounding Adam
        # steps accumulate ~1e-6 fp32 noise — semantics, not bitwise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


def test_dp_pipeline_end_to_end_8dev(setup):
    """Full DP training pipeline on the 8-device mesh: densify interval,
    opacity reset and the overflow guard all run under the mesh; loss stays
    finite and parameters move."""
    scene, model = setup
    seen = []

    def cb(iteration, m, metrics, opt_state=None, **kw):
        seen.append(float(metrics.loss))

    opt_cfg = OptimizationConfig(
        iterations=8, densification_interval=4, densify_from_iter=1,
        densify_until_iter=100, densify_grad_threshold=1e-6,
        opacity_reset_interval=10_000,
    )
    state = pipeline.run_main_stage(
        model, scene["bundle"], scene["cams"], scene["gts"],
        view_ids=[0, 1, 2], rng=jax.random.key(0), opt_cfg=opt_cfg,
        extras=TrainExtras(bg_capacity=128), backend="oracle",
        iterations=8, mesh=dp.make_mesh(8),
        callback=cb,
    )
    assert len(seen) == 8 and all(np.isfinite(v) for v in seen)
    # params moved (bg capacity may have auto-grown, so compare ray params)
    diff = float(jnp.sum(jnp.abs(state.model.params.zval - model.params.zval)))
    assert diff > 0
    # the aggressive threshold actually densified under the mesh
    assert int(np.asarray(state.model.bg_alive).sum()) > 0


def test_tile_sharded_render_matches_single(setup):
    """Tile-sharded rendering == single-device rasterize, bitwise per tile."""
    import jax.numpy as jnp
    from scgaussian_tpu.renderer import project as pm
    from scgaussian_tpu.renderer import tile_raster as tr
    from scgaussian_tpu.parallel import tiles as tile_shard

    scene, model = setup
    cam = scene["cams"][0]
    proj = pm.project(
        cam,
        model.get_xyz(),
        model.get_opacity().reshape(-1),
        scales=model.get_scaling(),
        rotations=model.get_rotation(),
        shs=model.get_features(),
        active_sh_degree=3,
    )
    img1, d1, a1, _ = tr.rasterize(proj, cam.width, cam.height, jnp.zeros(3),
                                   entry_budget=8192)
    mesh = dp.make_mesh(8, axis="tiles")
    img2, d2, a2, _ = tile_shard.rasterize_tile_sharded(
        mesh, proj, cam.width, cam.height, jnp.zeros(3), entry_budget=8192,
    )
    # both paths now run the SAME v3 stream kernels; row-restricted binning
    # reproduces each tile's entry set, depth order and chunk alignment
    # exactly, so the sharded forward is bitwise-equal per tile
    np.testing.assert_array_equal(np.asarray(img2), np.asarray(img1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a1))

    # gradients: tile-sharded render is differentiable (stream kernels +
    # custom VJP under shard_map) and matches the single-device gradients
    import dataclasses as _dc

    def loss_sharded(mean2d):
        p = _dc.replace(proj, mean2d=mean2d)
        img, d, a, _ = tile_shard.rasterize_tile_sharded(
            mesh, p, cam.width, cam.height, jnp.zeros(3), entry_budget=8192
        )
        return jnp.sum(img**2) + jnp.sum(d**2)

    def loss_single(mean2d):
        p = _dc.replace(proj, mean2d=mean2d)
        img, d, a, _ = tr.rasterize(
            p, cam.width, cam.height, jnp.zeros(3), entry_budget=8192
        )
        return jnp.sum(img**2) + jnp.sum(d**2)

    g2 = jax.grad(loss_sharded)(proj.mean2d)
    g1 = jax.grad(loss_single)(proj.mean2d)
    scale = np.abs(np.asarray(g1)).max() + 1e-8
    # same kernels, but the entry->Gaussian reduction order differs (global
    # cumsum segments vs per-shard cumsum + psum): fp32 noise only
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5 * scale)


def test_primitive_tile_2d_mesh_render(setup):
    """2-D (prim, tiles) mesh: fully sharded render matches single-device,
    and gradients flow through the all-gather/reduce-scatter transposes."""
    import jax.numpy as jnp
    from scgaussian_tpu.parallel import primitives as prim
    from scgaussian_tpu.renderer import project as pm
    from scgaussian_tpu.renderer import tile_raster as tr

    scene, model = setup
    cam = scene["cams"][0]
    n = model.total
    # pad the primitive axis to a multiple of 2
    pad = (-n) % 2
    means = jnp.concatenate([model.get_xyz(), jnp.zeros((pad, 3))])
    opac = jnp.concatenate([model.get_opacity().reshape(-1), jnp.zeros((pad,))])
    scl = jnp.concatenate([model.get_scaling(), jnp.full((pad, 3), 1e-6)])
    rot = jnp.concatenate([model.get_rotation(), jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (pad, 1))])
    shs = jnp.concatenate([model.get_features(), jnp.zeros((pad, 16, 3))])

    mesh = prim.make_mesh_2d(2, 4)
    img2, d2, a2, ovf2 = prim.render_sharded(
        mesh, cam, means, opac, scl, rot, shs, jnp.zeros(3), entry_budget=8192
    )
    assert int(ovf2) == 0

    proj = pm.project(cam, means, opac, scales=scl, rotations=rot, shs=shs, active_sh_degree=3)
    img1, d1, a1, _ = tr.rasterize(proj, cam.width, cam.height, jnp.zeros(3), entry_budget=8192)
    # same stream kernels on both paths: bitwise per tile (see note above)
    np.testing.assert_array_equal(np.asarray(img2), np.asarray(img1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))

    # gradient flow through both collectives
    def loss(means, opac):
        img, d, a, _ = prim.render_sharded(
            mesh, cam, means, opac, scl, rot, shs, jnp.zeros(3), entry_budget=8192
        )
        return jnp.sum(img**2)

    g_means, g_opac = jax.grad(loss, argnums=(0, 1))(means, opac)

    def loss1(means, opac):
        p = pm.project(cam, means, opac, scales=scl, rotations=rot, shs=shs, active_sh_degree=3)
        img, d, a, _ = tr.rasterize(p, cam.width, cam.height, jnp.zeros(3), entry_budget=8192)
        return jnp.sum(img**2)

    g1_means, g1_opac = jax.grad(loss1, argnums=(0, 1))(means, opac)
    scale = np.abs(np.asarray(g1_means)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(g_means), np.asarray(g1_means), atol=5e-4 * scale)
    scale = np.abs(np.asarray(g1_opac)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(g_opac), np.asarray(g1_opac), atol=5e-4 * scale)


def test_dp_step_pallas_path_matches_single(setup):
    """DP-vs-single parity ON THE PALLAS KERNEL PATH (interpret mode on the
    CPU mesh): the oracle-only parity tests cannot see a kernel-path-only
    regression in the DP plumbing (overflow pmax, densify-stat psums) —
    round-4 verdict weak #6. 8 devices rendering the SAME camera must match
    the single-device train_step on params AND metrics incl. overflow."""
    from scgaussian_tpu.train.main_stage import train_step

    scene, model = setup
    mesh = dp.make_mesh(8)
    bundle = scene["bundle"]
    opt_cfg = OptimizationConfig()
    extras = TrainExtras(bg_capacity=128)
    raster = RasterizerConfig(entry_budget=8192)

    cams = dp.stack_cameras([scene["cams"][0]] * 8)
    gts = jnp.stack([scene["gts"][0]] * 8)
    vids = jnp.zeros((8,), jnp.int32)

    opt_state = optim.init(model.params)
    m_dp, o_dp, met_dp = dp.dp_train_step(
        mesh, model, opt_state, bundle, cams, gts, vids, jnp.int32(1),
        jnp.zeros(3), opt_cfg, raster=raster, extras=extras, backend="tpu",
    )
    m_1, o_1, met_1 = train_step(
        model, optim.init(model.params), bundle, scene["cams"][0],
        scene["gts"][0], jnp.int32(0), jnp.int32(1), jnp.zeros(3), opt_cfg,
        raster=raster, extras=extras, backend="tpu",
    )
    np.testing.assert_allclose(float(met_dp.loss), float(met_1.loss), rtol=1e-5)
    np.testing.assert_allclose(float(met_dp.l1), float(met_1.l1), rtol=1e-5)
    assert int(met_dp.overflow) == int(met_1.overflow) == 0
    assert int(met_dp.num_visible) == int(met_1.num_visible)
    for a, b in zip(
        jax.tree_util.tree_leaves(m_dp.params), jax.tree_util.tree_leaves(m_1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dp_step_pallas_overflow_reported(setup):
    """A starved entry budget on the kernel-path DP step must surface a
    positive overflow through the per-device pmax (not silently truncate)."""
    scene, model = setup
    mesh = dp.make_mesh(8)
    opt_cfg = OptimizationConfig()
    extras = TrainExtras(bg_capacity=128)
    # a deliberately starved budget for this scene
    raster = RasterizerConfig(entry_budget=64)
    cams = dp.stack_cameras([scene["cams"][0]] * 8)
    gts = jnp.stack([scene["gts"][0]] * 8)
    vids = jnp.zeros((8,), jnp.int32)
    _, _, met = dp.dp_train_step(
        mesh, model, optim.init(model.params), scene["bundle"], cams, gts,
        vids, jnp.int32(1), jnp.zeros(3), opt_cfg, raster=raster,
        extras=extras, backend="tpu",
    )
    assert int(met.overflow) > 0


def test_2d_mesh_overflow_reported(setup):
    """Entry-budget truncation on the (prim, tiles) mesh path must be
    visible to callers via the returned overflow scalar (round-4 verdict
    weak #4: it was silently dropped)."""
    from scgaussian_tpu.parallel import primitives as prim

    scene, model = setup
    cam = scene["cams"][0]
    n = model.total
    pad = (-n) % 2
    means = jnp.concatenate([model.get_xyz(), jnp.zeros((pad, 3))])
    opac = jnp.concatenate([model.get_opacity().reshape(-1), jnp.zeros((pad,))])
    scl = jnp.concatenate([model.get_scaling(), jnp.full((pad, 3), 1e-6)])
    rot = jnp.concatenate(
        [model.get_rotation(), jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (pad, 1))]
    )
    shs = jnp.concatenate([model.get_features(), jnp.zeros((pad, 16, 3))])

    mesh = prim.make_mesh_2d(2, 4)
    # a deliberately starved per-shard budget: the scene needs more entries
    # than 8 per tile-row shard (asserted below via the overflow count)
    img, d, a, ovf = prim.render_sharded(
        mesh, cam, means, opac, scl, rot, shs, jnp.zeros(3), entry_budget=8
    )
    assert int(ovf) > 0
