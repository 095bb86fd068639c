"""Image losses: L1, windowed SSIM, PSNR.

jnp re-implementations with the exact constants/padding of the reference:
- `l1_loss`/`l2_loss` (`utils/loss_utils.py:40-44`)
- 11x11 sigma-1.5 Gaussian-window SSIM with zero padding
  (`utils/loss_utils.py:46-94`), used by training (`train.py:161`) and
  metrics (`metrics.py:87`)
- 5x5 AvgPool + reflection-pad SSIM error map (`utils/loss_utils.py:162-205`)
  used for render.py error visualizations
- `psnr`/`mse` (`utils/image_utils.py:15-19`)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

C1 = 0.01**2
C2 = 0.03**2


def l1_loss(output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(output - gt))


def l2_loss(output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((output - gt) ** 2)


def mse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image MSE over flattened pixels (`utils/image_utils.py:15-16`)."""
    b = img1.shape[0]
    return jnp.mean((img1.reshape(b, -1) - img2.reshape(b, -1)) ** 2, axis=1, keepdims=True)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """`utils/image_utils.py:18-19`: 20 log10(1/sqrt(mse)) per image."""
    m = mse(img1, img2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_conv(img: jnp.ndarray, window: jnp.ndarray, padding) -> jnp.ndarray:
    """img [C, H, W], window [kh, kw] applied per channel (groups=C)."""
    c = img.shape[0]
    kernel = jnp.broadcast_to(window[None, None], (c, 1, *window.shape))
    # HIGHEST precision is required on TPU: the default bf16 multiply error
    # (~4e-3 on O(1) values) exceeds C2=9e-4, so the E[x^2]-mu^2 variance
    # cancellation yields SSIM>1 on flat regions and corrupted gradients.
    return jax.lax.conv_general_dilated(
        img[None],
        kernel,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )[0]


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    mask: jnp.ndarray | None = None,
    size_average: bool = True,
) -> jnp.ndarray:
    """Windowed SSIM, zero padding (matches `_ssim`, `utils/loss_utils.py:66-94`).

    Args: img1/img2 [C, H, W] in [0, 1].
    """
    window = jnp.asarray(_gaussian_window(window_size, 1.5))
    pad = [(window_size // 2, window_size // 2)] * 2
    conv = lambda x: _depthwise_conv(x, window, pad)

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if mask is not None:
        mask_c = _depthwise_conv(mask[None] if mask.ndim == 2 else mask, window, pad)
        ssim_map = ssim_map * mask_c
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(0, 1, 2))


def avgpool_ssim_map(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """5x5 AvgPool SSIM error map with reflection padding.

    Matches the `SSIM` module (`utils/loss_utils.py:162-193`): returns
    clamp((1 - SSIM_n/SSIM_d)/2, 0, 1) as [C, H, W].
    """
    refl = lambda im: jnp.pad(im, ((0, 0), (2, 2), (2, 2)), mode="reflect")
    x, y = refl(x), refl(y)
    window = jnp.full((5, 5), 1.0 / 25.0, dtype=jnp.float32)
    pool = lambda im: _depthwise_conv(im, window, [(0, 0), (0, 0)])
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x**2) - mu_x**2
    sigma_y = pool(y**2) - mu_y**2
    sigma_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)


def pixel_loss_map(image: jnp.ndarray, gt_image: jnp.ndarray) -> jnp.ndarray:
    """0.5 L1 + 0.5 avgpool-SSIM per-pixel error map
    (`get_pixel_loss`, `utils/loss_utils.py:195-205`), used by render.py."""
    l1 = jnp.mean(jnp.abs(image - gt_image), axis=0)
    sl = jnp.mean(avgpool_ssim_map(image, gt_image), axis=0)
    return 0.5 * l1 + 0.5 * sl
