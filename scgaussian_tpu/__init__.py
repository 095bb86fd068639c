"""SCGaussian-TPU: a TPU-native (JAX/XLA/Pallas) framework for structure-
consistent Gaussian splatting with matching priors (few-shot novel view
synthesis).

Re-designed from scratch for TPU hardware with the same capabilities as the
reference CUDA/PyTorch implementation (prstrive/SCGaussian):

- hybrid ray-based + free-xyz Gaussian representation
- differentiable tile-based rasterizer with RGB + depth + alpha outputs,
  implemented as XLA projection/binning + Pallas MXU compositing kernels
- two-stage training (match-prior depth init, photometric + structure
  consistency), densification with fixed-capacity alive-mask state
- LLFF / DTU / Tanks&Temples / Blender data pipelines, evaluation
  (PSNR/SSIM/LPIPS/AVG), video rendering, and multi-device sharding.
"""

__version__ = "0.1.0"
