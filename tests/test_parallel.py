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
    raster = RasterizerConfig(max_per_tile=256, entry_budget=8192)

    cams = dp.stack_cameras([scene["cams"][0]] * 8)
    gts = jnp.stack([scene["gts"][0]] * 8)
    vids = jnp.zeros((8,), jnp.int32)

    opt_state = optim.init(model.params)
    m_dp, o_dp, loss_dp = dp.dp_train_step(
        mesh, model, opt_state, bundle, cams, gts, vids, jnp.int32(1),
        jnp.zeros(3), opt_cfg, raster=raster, extras=extras, backend="oracle",
    )

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
    m2, o2, loss = dp.dp_train_step(
        mesh, model, optim.init(model.params), scene["bundle"], cams, gts, vids,
        jnp.int32(1), jnp.zeros(3), OptimizationConfig(),
        raster=RasterizerConfig(max_per_tile=256, entry_budget=8192),
        extras=TrainExtras(bg_capacity=128), backend="oracle",
    )
    assert np.isfinite(float(loss))
    # params actually moved
    diff = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(m2.params), jax.tree_util.tree_leaves(model.params)
        )
    )
    assert diff > 0


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
    # img1 comes from the v3 STREAM kernels, img2 from the v2 flat kernels:
    # the two evaluate alpha with different (documented) fp32 op orders
    # (exp(powop - relu(power)) with folded log-opacity vs op * exp(min)),
    # so cross-kernel agreement is ~1e-5 absolute, not bitwise.
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img1), atol=2e-5)
    # depth is metric-valued (~camera distance), so tolerance needs rtol
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=2e-5)

    # gradients: tile-sharded render is differentiable (flat kernels + custom
    # VJP under shard_map) and matches the single-device gradients
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
    # cross-kernel gradient budget: each kernel family's own oracle parity
    # is asserted at 5e-4*scale (test_tile_raster); comparing v2-flat grads
    # against v3-stream grads composes both budgets.
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=5e-4 * scale)


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
    img2, d2, a2 = prim.render_sharded(
        mesh, cam, means, opac, scl, rot, shs, jnp.zeros(3), entry_budget=8192
    )

    proj = pm.project(cam, means, opac, scales=scl, rotations=rot, shs=shs, active_sh_degree=3)
    img1, d1, a1, _ = tr.rasterize(proj, cam.width, cam.height, jnp.zeros(3), entry_budget=8192)
    # cross-kernel (v2 flat vs v3 stream) tolerance — see note above
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=1e-4, atol=2e-5)

    # gradient flow through both collectives
    def loss(means, opac):
        img, d, a = prim.render_sharded(
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
