"""Benchmark: rasterizer forward+backward throughput on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: rays/s/chip for a full differentiable render (forward + backward
through projection, binning, and the Pallas compositing kernels) at
1080p-class resolution with a realistic primitive count. `vs_baseline` is
measured against the reference CUDA pipeline's published order of magnitude;
the reference publishes no in-tree numbers (BASELINE.md), so until a
reference run exists we report the ratio vs a 3090-class diff-gaussian-
rasterization fwd+bwd estimate of ~150 it/s at 1080p (~3.1e8 rays/s).
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_S = 3.1e8  # see module docstring


def main(dense: bool = False):
    import jax
    import jax.numpy as jnp

    from scgaussian_tpu.core.cameras import Camera
    from scgaussian_tpu.renderer import render

    if dense:
        # BASELINE config 5 scale ("-r 1" dense protocol): 4K-class
        # resolution, N >= 500k primitives. The 4K tile grid (240x135) pads
        # every non-empty tile's segment to a 128-entry chunk, so the
        # aligned stream needs a budget above the 4N default — sized here
        # exactly as the training overflow guard would regrow it.
        # Measured workload: 5.58M tile entries, 6.39M aligned slots
        # (32.4k tiles pad to 128-entry chunks; true aligned need 7.41M). Budgets sized as the
        # training overflow guard would regrow them: entries + ~13%,
        # aligned + ~15%, both multiples of the 2048-slot stream block.
        W, H = 3840, 2160
        N = 500_000
        entry_budget = 6_291_456
        aligned_budget = 7_602_176
    else:
        W, H = 1920, 1080
        N = 100_000
        # Measured workload after the exact-equivalence extents cull
        # (project.py ext): 380,073 tile entries (the CUDA square rect
        # would emit 435,840), aligned need exactly 8160 tiles x 128 =
        # 1,044,480 slots. Budgets sized as the training overflow guard
        # would regrow them: entries + ~10%, aligned + one stream block,
        # both multiples of the 2048-slot stream block (and the entry
        # budget a multiple of 4096 for the two-level tile-starts search).
        # overflow == 0 is asserted below — every emitted entry composites.
        entry_budget = 417_792
        aligned_budget = 1_046_528
    rng = np.random.default_rng(0)
    means = np.stack(
        [rng.uniform(-3, 3, N), rng.uniform(-2, 2, N), rng.uniform(2, 10, N)], -1
    ).astype(np.float32)
    # Splat sizes chosen so the full workload fits the default entry budget
    # with zero truncation (436k tile entries at 1080p, verified
    # overflow == 0): every emitted entry is composited, matching CUDA's
    # unbudgeted semantics. (The previous U(-5,-3) scene emitted 1.54M
    # entries and silently truncated half of them.)
    scales = np.exp(rng.uniform(-5.5, -4.0, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
    shs = np.zeros((N, 16, 3), np.float32)
    shs[:, 0] = rng.uniform(-1, 1, (N, 3))
    cam = Camera.create(np.eye(3), np.zeros(3), 0.9, 0.6, W, H)

    @jax.jit
    def fwdbwd(*args):
        def loss(*a):
            out = render(
                cam, a[0], a[1], jnp.zeros(3), scales=a[2], rotations=a[3],
                shs=a[4], active_sh_degree=3, backend="tpu",
                entry_budget=entry_budget, aligned_budget=aligned_budget,
            )
            return (
                jnp.sum(out.render**2)
                + jnp.sum(out.rendered_depth**2)
                + jnp.sum(out.rendered_alpha)
            )

        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
        # consume the gradients ON DEVICE (as the optimizer step would):
        # returning the full pytree ships 27-135 MB/iter through the axon
        # tunnel and times the network, not the chip (415 ms vs 188 ms
        # device at the dense config)
        return l + sum(jnp.sum(g) for g in grads)

    args = tuple(jnp.asarray(x) for x in (means, opac, scales, quats, shs))

    # truncation audit: the timed workload must composite every emitted tile
    # entry (CUDA's unbudgeted semantics) or the throughput number is fake
    @jax.jit
    def overflow_check(*a):
        out = render(
            cam, a[0], a[1], jnp.zeros(3), scales=a[2], rotations=a[3],
            shs=a[4], active_sh_degree=3, backend="tpu",
            entry_budget=entry_budget, aligned_budget=aligned_budget,
        )
        return out.overflow

    assert int(overflow_check(*args)) == 0, "bench scene overflows entry budget"

    out = fwdbwd(*args)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        out = fwdbwd(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters

    rays_per_s = W * H / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_s_per_chip_fwdbwd_"
                + ("4k_dense" if dense else "1080p"),
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    import sys

    main(dense="--dense" in sys.argv)
