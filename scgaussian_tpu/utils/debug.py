"""Debug / sanitizer affordances (SURVEY.md 5.2).

The reference exposes `--detect_anomaly` (torch autograd anomaly mode) and a
rasterizer `debug` flag that snapshots state on kernel exceptions
(`train.py:303`, `gaussian_renderer/__init__.py:50`). TPU-native
equivalents:

- `debug_nans(enable)` — jax_debug_nans (enabled by the trainer's
  --detect_anomaly flag);
- `interpret_kernels()` — context manager forcing all Pallas kernels through
  the interpreter (the effective "sanitizer" for kernel logic);
- `check_model_finite(model)` — scans every model leaf for NaN/Inf and
  reports offending fields, the debug-dump analog of the CUDA snapshot.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def interpret_kernels():
    """Run Pallas kernels in interpreter mode inside the context."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def check_model_finite(model) -> Dict[str, dict]:
    """Return {field: {nan: int, inf: int, max_abs: float}} for non-finite
    leaves of a GaussianModel (empty dict == healthy)."""
    report = {}
    for field in dataclasses.fields(model.params):
        arr = np.asarray(getattr(model.params, field.name))
        n_nan = int(np.isnan(arr).sum())
        n_inf = int(np.isinf(arr).sum())
        if n_nan or n_inf:
            finite = arr[np.isfinite(arr)]
            report[field.name] = {
                "nan": n_nan,
                "inf": n_inf,
                "max_abs": float(np.abs(finite).max()) if finite.size else None,
            }
    return report


def assert_model_finite(model) -> None:
    report = check_model_finite(model)
    if report:
        raise FloatingPointError(f"non-finite model state: {report}")
