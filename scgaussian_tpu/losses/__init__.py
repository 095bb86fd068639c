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
from scgaussian_tpu.losses.aux import (  # noqa: F401
    get_smooth_loss,
    patchify,
    margin_l2_loss,
    patch_norm_mse_loss,
    ranking_loss,
    cons_loss,
    get_virtual_warp_loss,
)
