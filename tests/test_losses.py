"""Loss parity vs the reference torch implementations (imported as oracles)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tests import reference_oracle  # noqa: F401
from utils import loss_utils as ref_loss
from utils import image_utils as ref_image

from scgaussian_tpu import losses


def test_l1_matches_reference():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(3, 32, 40)).astype(np.float32)
    b = rng.uniform(size=(3, 32, 40)).astype(np.float32)
    ours = float(losses.l1_loss(jnp.asarray(a), jnp.asarray(b)))
    ref = float(ref_loss.l1_loss(torch.from_numpy(a), torch.from_numpy(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_ssim_matches_reference():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(3, 48, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(size=a.shape).astype(np.float32) * 0.1, 0, 1)
    ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = float(ref_loss.ssim(torch.from_numpy(a), torch.from_numpy(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_psnr_matches_reference():
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(3, 16, 16)).astype(np.float32)
    b = rng.uniform(size=(3, 16, 16)).astype(np.float32)
    ours = np.asarray(losses.psnr(jnp.asarray(a), jnp.asarray(b)))
    ref = ref_image.psnr(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_pixel_loss_map_matches_reference():
    rng = np.random.default_rng(3)
    a = rng.uniform(size=(3, 24, 24)).astype(np.float32)
    b = rng.uniform(size=(3, 24, 24)).astype(np.float32)
    ours = np.asarray(losses.pixel_loss_map(jnp.asarray(a), jnp.asarray(b)))
    ref = ref_loss.get_pixel_loss(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_grid_sample_matches_torch():
    """Our bilinear sampler must reproduce F.grid_sample(mode=bilinear,
    align_corners=False, zero padding) — used by the match losses."""
    rng = np.random.default_rng(4)
    img = rng.uniform(size=(3, 20, 30)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(50, 2)).astype(np.float32)  # incl. out of range
    ours = np.asarray(losses.grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    ref = (
        F.grid_sample(
            torch.from_numpy(img)[None],
            torch.from_numpy(grid)[None, None],
            mode="bilinear",
            align_corners=False,
        )[0, :, 0]
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
