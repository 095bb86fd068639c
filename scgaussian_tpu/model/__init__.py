from scgaussian_tpu.model.gaussians import (  # noqa: F401
    GaussianParams,
    GaussianModel,
)
