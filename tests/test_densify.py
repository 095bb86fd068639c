"""Unit tests for fixed-capacity densification/prune/opacity-reset surgery:
the invariants of `scene/gaussian_model.py:644-651,864-928` on the
alive-mask model."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from scgaussian_tpu.core.transforms import inverse_sigmoid
from scgaussian_tpu.model.densify import densify_and_prune, reset_opacity, update_stats
from scgaussian_tpu.model.gaussians import create_model
from scgaussian_tpu.train import optim


def make_model(nr=8, cb=16, seed=0):
    rng = np.random.default_rng(seed)
    rayd = rng.normal(size=(nr, 3)).astype(np.float32)
    rayd /= np.linalg.norm(rayd, axis=-1, keepdims=True)
    model = create_model(
        np.zeros((nr, 3), np.float32),
        rayd,
        rng.uniform(2, 5, nr).astype(np.float32),
        rng.uniform(size=(nr, 3)).astype(np.float32),
        3,
        1.0,
        bg_capacity=cb,
    )
    return model


def test_clone_goes_to_bg_and_fg_constant():
    model = make_model()
    opt = optim.init(model.params)
    n = model.total
    # force a clone of fg gaussian 0: high grad stat, small scale
    model = dataclasses.replace(
        model,
        xyz_gradient_accum=jnp.zeros((n, 1)).at[0, 0].set(1.0),
        denom=jnp.ones((n, 1)),
        params=dataclasses.replace(model.params, scaling=jnp.full((8, 3), -8.0)),
    )
    m2, opt2, dropped = densify_and_prune(
        model, opt, jax.random.key(0), 1e-4, 0.005, extent=100.0,
        max_screen_size=None, percent_dense=0.01,
    )
    assert m2.num_ray == model.num_ray
    assert int(dropped) == 0
    # exactly one new bg slot, a copy of fg 0's position
    alive = np.asarray(m2.bg_alive)
    assert alive.sum() == 1
    slot = int(np.nonzero(alive)[0][0])
    np.testing.assert_allclose(
        np.asarray(m2.params.bg_xyz[slot]), np.asarray(model.get_xyz()[0]), rtol=1e-5
    )
    # stats reset
    assert float(jnp.sum(m2.xyz_gradient_accum)) == 0.0


def test_split_shrinks_fg_in_place_and_emits_children():
    model = make_model()
    opt = optim.init(model.params)
    n = model.total
    # force a split of fg 1: high grad, LARGE scale
    scaling = jnp.full((8, 3), -8.0).at[1].set(jnp.log(2.0))
    model = dataclasses.replace(
        model,
        xyz_gradient_accum=jnp.zeros((n, 1)).at[1, 0].set(1.0),
        denom=jnp.ones((n, 1)),
        params=dataclasses.replace(model.params, scaling=scaling),
    )
    old_log_scale = float(model.params.scaling[1, 0])
    m2, opt2, dropped = densify_and_prune(
        model, opt, jax.random.key(1), 1e-4, 0.005, extent=1.0,
        max_screen_size=None, percent_dense=0.01,
    )
    # reference verbatim: fg log-scale divided by 0.8*N (N=2)
    np.testing.assert_allclose(
        float(m2.params.scaling[1, 0]), old_log_scale / 1.6, rtol=1e-6
    )
    # two children in bg with shrunk (log) scale = log(scale/1.6)
    alive = np.asarray(m2.bg_alive)
    assert alive.sum() == 2
    slots = np.nonzero(alive)[0]
    np.testing.assert_allclose(
        np.asarray(m2.params.bg_scaling[slots][:, 0]),
        np.log(2.0 / 1.6),
        rtol=1e-5,
    )
    # fg scaling Adam moments were zeroed wholesale (replace_tensor semantics)
    assert float(jnp.sum(jnp.abs(opt2.m.scaling))) == 0.0


def test_prune_clears_low_opacity_bg_only():
    model = make_model()
    opt = optim.init(model.params)
    # activate two bg slots: one opaque, one nearly transparent
    params = dataclasses.replace(
        model.params,
        bg_opacity=model.params.bg_opacity.at[0].set(inverse_sigmoid(jnp.asarray([0.5])))
        .at[1]
        .set(inverse_sigmoid(jnp.asarray([0.001]))),
        bg_xyz=model.params.bg_xyz.at[0].set(jnp.asarray([0.0, 0, 4]))
        .at[1]
        .set(jnp.asarray([0.1, 0, 4])),
    )
    # fg: make opacity 0 for fg 2 — must NOT be pruned (never prune rays)
    params = dataclasses.replace(
        params, opacity=params.opacity.at[2].set(inverse_sigmoid(jnp.asarray([0.0001])))
    )
    model = dataclasses.replace(
        model, params=params, bg_alive=model.bg_alive.at[:2].set(True)
    )
    m2, _, _ = densify_and_prune(
        model, opt, jax.random.key(2), 1e9, 0.005, extent=1.0,
        max_screen_size=None, percent_dense=0.01,
    )
    alive = np.asarray(m2.bg_alive)
    assert bool(alive[0]) and not bool(alive[1])
    assert m2.num_ray == 8  # fg untouched


def test_capacity_overflow_reports_dropped():
    model = make_model(nr=8, cb=4)
    opt = optim.init(model.params)
    n = model.total
    model = dataclasses.replace(
        model,
        xyz_gradient_accum=jnp.ones((n, 1)),  # all fg want to clone
        denom=jnp.ones((n, 1)),
        params=dataclasses.replace(model.params, scaling=jnp.full((8, 3), -8.0)),
    )
    m2, _, dropped = densify_and_prune(
        model, opt, jax.random.key(3), 1e-4, 0.005, extent=100.0,
        max_screen_size=None, percent_dense=0.01,
    )
    assert int(np.asarray(m2.bg_alive).sum()) == 4
    assert int(dropped) == 4  # 8 clone candidates, 4 slots


def test_reset_opacity_caps_at_001():
    model = make_model()
    opt = optim.init(model.params)
    opt = optim.AdamState(
        m=dataclasses.replace(opt.m, opacity=jnp.ones_like(opt.m.opacity)),
        v=opt.v,
        count=opt.count,
    )
    m2, opt2 = reset_opacity(model, opt)
    op = np.asarray(jax.nn.sigmoid(m2.params.opacity))
    assert (op <= 0.01 + 1e-6).all()
    assert float(jnp.sum(jnp.abs(opt2.m.opacity))) == 0.0


def test_update_stats_ndc_scaling():
    model = make_model()
    n = model.total
    radii = jnp.zeros((n,), jnp.int32).at[0].set(5)
    g = jnp.zeros((n, 2)).at[0].set(jnp.asarray([0.01, 0.02]))
    m2 = update_stats(model, radii, g, width=100, height=50)
    expect = np.linalg.norm([0.01 * 50, 0.02 * 25])
    np.testing.assert_allclose(float(m2.xyz_gradient_accum[0, 0]), expect, rtol=1e-5)
    assert float(m2.denom[0, 0]) == 1.0
    assert float(m2.max_radii2d[0]) == 5.0
    assert float(m2.denom[1, 0]) == 0.0
