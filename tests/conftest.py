"""Test configuration: force an 8-device virtual CPU platform so sharding
code paths (pjit / shard_map over a Mesh) are exercised without TPU hardware
(SURVEY.md section 4, item 4)."""

import os

# Force-override: the environment presets JAX_PLATFORMS=axon (real TPU via a
# tunnel) and sitecustomize PRE-IMPORTS jax, so env vars alone are ignored.
# jax.config.update still works because the backend isn't initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
