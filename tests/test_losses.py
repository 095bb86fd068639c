"""Loss parity vs the reference torch implementations (imported as oracles)."""

import numpy as np
import jax
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


def test_ssim_convs_pin_highest_precision():
    """TPU regression guard: the SSIM window convolutions MUST run at
    HIGHEST precision. The default TPU conv precision is bf16, whose ~4e-3
    multiply error exceeds the C2=9e-4 stabilizer — the E[x^2]-mu^2 variance
    cancellation then yields SSIM > 1 on flat regions and corrupted
    gradients (observed as full-protocol training divergence). CPU runs hide
    this (fp32 convs regardless), so pin the precision in the jaxpr."""
    img = jnp.zeros((3, 32, 32))
    jaxpr = jax.make_jaxpr(losses.ssim)(img, img)
    convs = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "conv_general_dilated"]
    assert convs, "ssim no longer lowers to conv_general_dilated?"
    for eqn in convs:
        prec = eqn.params.get("precision")
        assert prec is not None and "HIGHEST" in str(prec), (
            f"SSIM conv precision degraded to {prec}; see losses/image.py"
        )


def test_ssim_flat_image_bounded():
    """SSIM of a near-flat pair must stay <= 1 (+fp noise); with bf16 conv
    precision it evaluates ~1.04 on TPU."""
    key = jax.random.key(0)
    a = jnp.full((3, 64, 96), 0.73) + 0.001 * jax.random.normal(key, (3, 64, 96))
    b = a + 0.0005 * jax.random.normal(jax.random.key(1), a.shape)
    val = float(jax.jit(losses.ssim)(a, b))
    assert 0.9 < val <= 1.0 + 1e-5, val


# ---- auxiliary (reference-present but training-unused) losses ----------------


def test_smooth_loss_matches_reference():
    rng = np.random.default_rng(7)
    depth = rng.uniform(size=(24, 31)).astype(np.float32)
    guide3 = rng.uniform(size=(3, 24, 31)).astype(np.float32)
    for guide in (None, guide3, guide3[0]):
        ours = float(losses.get_smooth_loss(
            jnp.asarray(depth), None if guide is None else jnp.asarray(guide)))
        ref = float(ref_loss.get_smooth_loss(
            torch.from_numpy(depth),
            None if guide is None else torch.from_numpy(guide)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_patchify_matches_unfold():
    rng = np.random.default_rng(8)
    # batch must be 1: the reference's own patchify crashes for B>1 (its
    # .view on a permuted non-contiguous tensor raises RuntimeError)
    x = rng.uniform(size=(1, 1, 16, 24)).astype(np.float32)
    ours = np.asarray(losses.patchify(jnp.asarray(x), 8))
    ref = ref_loss.patchify(torch.from_numpy(x), 8).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=0)


def test_patch_norm_mse_loss_matches_reference():
    rng = np.random.default_rng(9)
    inp = rng.uniform(size=(1, 1, 32, 32)).astype(np.float32)
    tgt = (inp + rng.normal(scale=0.3, size=inp.shape)).astype(np.float32)
    fore = (rng.uniform(size=inp.shape) < 0.2).astype(np.float32)
    ours = float(losses.patch_norm_mse_loss(
        jnp.asarray(inp), jnp.asarray(tgt), jnp.asarray(fore), 8, margin=0.2))
    ref = float(ref_loss.patch_norm_mse_loss(
        torch.from_numpy(inp), torch.from_numpy(tgt), torch.from_numpy(fore),
        8, margin=0.2))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_ranking_loss_matches_reference():
    import random as pyrandom

    rng = np.random.default_rng(10)
    inp = rng.uniform(size=(1, 1, 32, 32)).astype(np.float32)
    tgt = rng.uniform(size=(1, 1, 32, 32)).astype(np.float32)
    # the reference draws its 6 pixel indices from Python's global RNG; seed
    # it, replay the draw to learn the indices, then pass them explicitly
    pyrandom.seed(3)
    idx = pyrandom.sample(list(range(64)), 6)
    pyrandom.seed(3)
    ref = float(ref_loss.ranking_loss(
        torch.from_numpy(inp), torch.from_numpy(tgt), 8))
    ours = float(losses.ranking_loss(
        jnp.asarray(inp), jnp.asarray(tgt), 8, sample_idx=jnp.asarray(idx)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_cons_loss_matches_reference():
    rng = np.random.default_rng(11)
    inp = rng.uniform(size=(1, 1, 16, 16)).astype(np.float32)
    tgt = (rng.uniform(size=(1, 1, 16, 16)) * 0.02).astype(np.float32)
    ours = float(losses.cons_loss(jnp.asarray(inp), jnp.asarray(tgt), 8))
    ref = float(ref_loss.cons_loss(torch.from_numpy(inp), torch.from_numpy(tgt), 8))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_virtual_warp_loss_matches_reference():
    rng = np.random.default_rng(12)
    h, w, nv = 16, 20, 2
    vimg = rng.uniform(size=(3, h, w)).astype(np.float32)
    vdepth = rng.uniform(1.0, 2.0, size=(h, w)).astype(np.float32)
    vc2w = np.eye(4, dtype=np.float32)[:3]
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 20.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    intrs = np.stack([intr] * nv)
    w2cs = np.stack([np.eye(4, dtype=np.float32) for _ in range(nv)])
    w2cs[1, 0, 3] = 0.1  # small x shift
    colors = rng.uniform(size=(nv, 3, h, w)).astype(np.float32)
    vmask = np.ones((1, h, w), dtype=bool)
    ours = float(losses.get_virtual_warp_loss(
        jnp.asarray(vimg), jnp.asarray(vdepth), jnp.asarray(vc2w),
        jnp.asarray(intrs), jnp.asarray(w2cs), jnp.asarray(colors),
        jnp.asarray(vmask)))
    ref = float(ref_loss.get_virtual_warp_loss(
        torch.from_numpy(vimg), torch.from_numpy(vdepth), vc2w,
        torch.from_numpy(intrs), torch.from_numpy(w2cs),
        torch.from_numpy(colors), torch.from_numpy(vmask)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
