"""Differentiable tile-based Gaussian rasterizer for TPU.

Structure (TPU-first redesign of the external CUDA extension
`diff_gaussian_rasterization`, used by `gaussian_renderer/__init__.py:100-108`
and ashawkey's depth/alpha fork — see SURVEY.md section 2.2):

- `project`   : EWA projection, covariance, SH->RGB (pure XLA, autodiff'd)
- `binning`   : tile binning + (tile, depth) sort (index computation, no grads)
- `composite` : per-tile front-to-back alpha compositing as MXU matmuls
                (Pallas kernel; custom VJP)
- `oracle`    : readable dense jnp reference renderer (test oracle)
- `render`    : user-facing API mirroring `gaussian_renderer.render()`
"""

from scgaussian_tpu.renderer.api import RenderOutput, render  # noqa: F401
