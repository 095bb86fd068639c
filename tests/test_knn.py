"""kNN scale-init op vs brute-force numpy (the distCUDA2 replacement)."""

import numpy as np
import jax.numpy as jnp

from scgaussian_tpu.model.knn import knn_mean_sq_dist


def brute_force(points, k=3):
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return np.sort(d2, axis=1)[:, :k].mean(axis=1)


def test_knn_matches_bruteforce_small():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(257, 3)).astype(np.float32)  # non-multiple of block
    ours = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), 3))
    ref = brute_force(pts)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_knn_matches_bruteforce_multiblock():
    rng = np.random.default_rng(1)
    pts = (rng.normal(size=(2100, 3)) * 5).astype(np.float32)  # spans blocks
    ours = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), 3))
    ref = brute_force(pts)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_knn_clusters():
    # two tight clusters far apart: NN distances stay within-cluster
    rng = np.random.default_rng(2)
    a = rng.normal(size=(50, 3)).astype(np.float32) * 0.01
    b = rng.normal(size=(50, 3)).astype(np.float32) * 0.01 + 100.0
    pts = np.concatenate([a, b])
    d = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), 3))
    assert d.max() < 1.0
