"""Configuration dataclasses mirroring the reference flag system.

Knob names and defaults are identical to `arguments/__init__.py:47-91`
(ModelParams / PipelineParams / OptimizationParams) so configs and results
diff cleanly against the reference; persistence uses JSON instead of the
reference's eval()'d Namespace string (`arguments/__init__.py:93-113`).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """`ModelParams` (`arguments/__init__.py:47-62`)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = False


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """`PipelineParams` (`arguments/__init__.py:64-69`)."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """`OptimizationParams` (`arguments/__init__.py:71-91`)."""

    iterations: int = 2_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 2_000
    feature_lr: float = 0.002
    opacity_lr: float = 0.055
    scaling_lr: float = 0.0055
    rotation_lr: float = 0.0015
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 200
    opacity_reset_until_iter: int = 2_000
    densify_from_iter: int = 500
    densify_until_iter: int = 2_000
    densify_grad_threshold: float = 0.0004
    random_background: bool = False


@dataclasses.dataclass(frozen=True)
class RasterizerConfig:
    """TPU rasterizer capacities (no reference analog; the CUDA rasterizer
    allocates dynamically). Static shapes -> recompile only when changed."""

    tile: int = 16
    # None => renderer.binning.default_entry_budget(N) (pow2 >= 4N); the
    # training pipeline's capacity guard doubles this (one recompile) if a
    # step ever reports truncated entries, so rendering is never silently
    # truncated (reference semantics are unbudgeted).
    entry_budget: Optional[int] = None
    # Processing-tile width for the stream kernels (semantic CUDA semantics
    # stay at `tile`; see renderer/binning.bin_gaussians). 0 = auto: 2*tile
    # when the semantic grid fits the packed-rect range (images <= 4096 px),
    # else `tile`. Measured ~10-50% faster fwd+bwd than tile at 1080p-4K.
    ptile: int = 0

    def resolved_ptile(self, width: int, height: int) -> int:
        if self.ptile:
            return self.ptile
        fits = (width + self.tile - 1) // self.tile <= 256 and (
            height + self.tile - 1
        ) // self.tile <= 256
        return 2 * self.tile if fits else self.tile


@dataclasses.dataclass(frozen=True)
class TrainExtras:
    """Hardcoded reference constants surfaced as config."""

    init_iterations: int = 2_000  # train.py:57
    init_lr: float = 0.5  # scene/gaussian_model.py:475
    init_loss_scale: float = 5.0  # train.py:66
    render_match_loss_weight: float = 0.3  # train.py:165
    promote_err_threshold: float = 0.1  # scene/gaussian_model.py:395
    prune_min_opacity: float = 0.005  # train.py:197
    size_threshold: int = 20  # train.py:196
    bg_capacity: int = 65536
    dtu_dark_threshold: float = 30.0 / 255.0  # train.py:152 (15/255 for scan110)
    dtu_shift_rows: int = 50  # train.py:156-157
    # Reference quirk: on split, ray-Gaussian parents divide their LOG-domain
    # scaling by 0.8*N (scene/gaussian_model.py:889-890), which GROWS typical
    # negative-log scales. True replicates it; False applies the activated-
    # domain shrink the bg children use.
    fg_split_log_quirk: bool = True
    # Capacity guards (no reference analog — the reference grows tensors
    # unboundedly, `scene/gaussian_model.py:777-842`; here growth is an
    # explicit recompile). True: auto-double entry budget / bg capacity when
    # a step reports truncation or dropped densify candidates. False: raise.
    guard_auto_grow: bool = True


def save_config(path: str, **groups) -> None:
    payload = {k: dataclasses.asdict(v) for k, v in groups.items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


def load_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
