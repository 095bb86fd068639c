"""Compiled-path parity: sort-route (MXU segment-sum kernel) vs gather
route, on the REAL TPU (the CPU test suite only exercises interpret mode).

Renders a mid-size scene twice with forced routing choices and compares
gradients. Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_route_parity.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def unit_exactness():
    """Adversarial on-device exactness check of the segsum kernel itself:
    cancellation-heavy mixed-sign values spanning 8 orders of magnitude,
    compared against a float64 segment sum. With the 3-term bf16-exact
    contraction concat every MXU product is exact, so the kernel must sit
    at f32 accumulation-order noise (~1e-7), same as a sequential f32 sum.
    (The 2-term hi/lo split is NOT exact — lo = x - bf16(x) keeps up to 16
    mantissa bits — and single-pass bf16 measured 1.5e-2.)"""
    import jax
    import jax.numpy as jnp

    from scgaussian_tpu.renderer import tile_raster as tr

    if jax.default_backend() != "tpu":
        # Off-TPU there is no Mosaic bf16 lowering to catch: interpret mode
        # computes full f32 and this check passes TRIVIALLY. Say so loudly —
        # a non-TPU run of this tool is NOT authoritative.
        print(
            f"WARNING: backend={jax.default_backend()} != tpu — "
            "unit_exactness is vacuous off-TPU (no Mosaic bf16 lowering); "
            "run on real TPU for an authoritative result",
            file=sys.stderr,
        )

    rng = np.random.default_rng(0)
    nb = 6
    L = nb * tr.SEG_B
    n = 3000
    keys = np.sort(rng.integers(0, n, L)).astype(np.int32)
    vals = (
        rng.normal(size=(16, L)) * 10.0 ** rng.uniform(0, 8, (16, L))
    ).astype(np.float32)
    keys2d = keys.reshape(nb, tr.SEG_B)
    fk8 = (keys2d[:, 0] // 8 * 8).astype(np.int32)
    assert all(keys2d[b, -1] - fk8[b] < tr.SEG_W for b in range(nb))
    out = jax.jit(lambda k, f, v: tr._segsum_sorted_mxu(k, f, v, n + 1))(
        jnp.asarray(keys2d), jnp.asarray(fk8), jnp.asarray(vals)
    )
    out = np.asarray(out)[: n + 1]
    ref = np.zeros((n + 1, 16))
    np.add.at(ref, keys, vals.astype(np.float64).T)
    err = (np.abs(out - ref).max(axis=0) / (np.abs(ref).max(axis=0) + 1e-30)).max()
    print(f"segsum kernel vs f64 rel err: {err:.2e}")
    assert err < 1e-6, f"segsum kernel not at f32 accumulation noise: {err}"


def main():
    import jax
    import jax.numpy as jnp

    from scgaussian_tpu.core.cameras import Camera
    from scgaussian_tpu.renderer import render
    from scgaussian_tpu.renderer import tile_raster

    unit_exactness()

    W, H, N = 960, 540, 20_000
    rng = np.random.default_rng(7)
    means = np.stack(
        [rng.uniform(-3, 3, N), rng.uniform(-2, 2, N), rng.uniform(2, 10, N)], -1
    ).astype(np.float32)
    scales = np.exp(rng.uniform(-5.0, -3.5, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
    shs = np.zeros((N, 16, 3), np.float32)
    shs[:, 0] = rng.uniform(-1, 1, (N, 3))
    cam = Camera.create(np.eye(3), np.zeros(3), 0.9, 0.6, W, H)
    args = tuple(jnp.asarray(x) for x in (means, opac, scales, quats, shs))

    def loss(*a):
        out = render(
            cam, a[0], a[1], jnp.zeros(3), scales=a[2], rotations=a[3],
            shs=a[4], active_sh_degree=3, backend="tpu", ptile=32,
        )
        return (
            jnp.sum(out.render**2)
            + 0.1 * jnp.sum(out.rendered_depth**2)
            + 0.1 * jnp.sum(out.rendered_alpha)
        )

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    g_gather = jax.tree_util.tree_map(np.asarray, grad(*args))

    tile_raster.SORT_ROUTE_MIN_L = 0  # force the sort route + segsum kernel
    grad2 = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    g_fast = jax.tree_util.tree_map(np.asarray, grad2(*args))

    # control: sort route with the cumsum fallback (window forced shut).
    # Attribution logic: the gather route reduces each Gaussian's segment
    # as a difference of two [L]-cumsum prefixes — cancellation-prone when
    # the running total dwarfs the segment sum — while the segsum kernel
    # sums each segment directly (better conditioned). If fast ~ slow-sort
    # and both differ from gather by the same order, the spread is the
    # gather route's summation noise, not a kernel defect.
    tile_raster.SEG_W = 16  # no real block span fits -> window_ok False
    # (16, not 8: the fast branch is still TRACED under lax.cond, and
    # SEG_W=8 makes its acc[1:] a zero-size vector Mosaic rejects)
    grad3 = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    g_slow = jax.tree_util.tree_map(np.asarray, grad3(*args))

    names = ["means", "opacity", "scales", "quats", "shs"]
    worst_fs = worst_fg = 0.0
    for name, g0, gf, gs in zip(names, g_gather, g_fast, g_slow):
        scale = np.abs(g0).max() + 1e-8
        e_fg = np.abs(gf - g0).max() / scale  # fast vs gather
        e_sg = np.abs(gs - g0).max() / scale  # slow-sort vs gather
        e_fs = np.abs(gf - gs).max() / scale  # fast vs slow-sort (same order)
        worst_fs = max(worst_fs, e_fs)
        worst_fg = max(worst_fg, e_fg)
        print(
            f"{name:8s} fast-vs-gather {e_fg:.2e}  slow-vs-gather {e_sg:.2e}"
            f"  fast-vs-slowsort {e_fs:.2e}  (|g|max {scale:.3e})"
        )
        assert np.isfinite(gf).all(), f"{name}: non-finite grads on sort route"
    # End-to-end the three routes differ ONLY in f32 accumulation order
    # (the kernel-level exactness contract is pinned SOLELY by
    # unit_exactness above — this 5e-3 bound is too loose to catch a
    # regression to the 2-term split, whose measured deviation was 2.6e-3),
    # but scales/quats
    # amplify that noise through the projection backward's conditioning:
    # tiny Gaussians carry ~1e8-magnitude per-pixel d_conic terms that
    # cancel to ~1e4 sums, so order noise lands at ~1e-3 of |g|max
    # (measured: all three pairwise spreads the same order). Assert the
    # conditioning-aware bound; the kernel-defect case (bf16 products,
    # 1.5e-2+) still trips it.
    assert worst_fs < 5e-3, f"segsum kernel deviates from cumsum fallback: {worst_fs}"
    print(
        f"TPU route parity OK (kernel vs fallback {worst_fs:.2e}; "
        f"gather-route spread {worst_fg:.2e})"
    )


if __name__ == "__main__":
    main()
