from scgaussian_tpu.losses.image import (  # noqa: F401
    l1_loss,
    l2_loss,
    mse,
    psnr,
    ssim,
    avgpool_ssim_map,
    pixel_loss_map,
)
from scgaussian_tpu.losses.sampling import grid_sample_2d, bilinear_sample_pix  # noqa: F401
