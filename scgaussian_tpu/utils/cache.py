"""Persistent XLA compilation cache for the CLI apps (OPT-IN).

A cold train-step compile at a new (resolution, N) shape costs minutes of
XLA time (the kernels themselves compile in ~1 s); on hardware with a local
compiler the persistent cache brings repeat runs down to cache-hit latency.

Opt in with SCGAUSSIAN_COMPILE_CACHE=/path (or =on for the default
~/.cache location). Default is OFF: measured through a remote-compile
TPU tunnel, cache serialization round-trips made a 1m49s metrics run take
>9 min — the cache only pays off when XLA compiles in-process, so the
caller must decide. (The reference has no analog — CUDA kernels are
AOT-compiled — so this is config surface, not parity surface.)
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    """Enable the on-disk XLA compile cache if requested via
    $SCGAUSSIAN_COMPILE_CACHE (idempotent). Returns the cache directory, or
    None when disabled (the default)."""
    target = os.environ.get("SCGAUSSIAN_COMPILE_CACHE", "")
    if not target or target.lower() in ("off", "0", "none", "disable"):
        return None
    if target.lower() in ("on", "1", "default"):
        target = os.path.join(
            os.path.expanduser("~"), ".cache", "scgaussian_tpu", "xla"
        )
    import jax

    os.makedirs(target, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", target)
    # cache everything that takes meaningful compile time; the default
    # 1 s floor would skip the many mid-sized eval/render graphs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return target
