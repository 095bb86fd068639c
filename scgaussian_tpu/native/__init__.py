"""Native (C++) runtime components, loaded via ctypes with Python fallbacks.

Build happens on demand with g++ (no pybind11 in this environment); the
compiled .so is cached next to the sources. `load_library(name)` returns the
ctypes CDLL or None if no compiler/cached artifact is available — callers
must degrade gracefully."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))


def load_library(name: str) -> Optional[ctypes.CDLL]:
    src = os.path.join(_DIR, f"{name}.cpp")
    so = os.path.join(_DIR, f"{name}.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        return ctypes.CDLL(so)
    except OSError:
        return None
