"""Helper to import pure modules of the read-only reference implementation
(/root/reference) as *test oracles* for parity checks. Only modules with no
CUDA/unavailable dependencies are usable (sh_utils, graphics_utils,
loss_utils, general_utils, image_utils)."""

import sys

REFERENCE_PATH = "/root/reference"

if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
