from scgaussian_tpu.core import sh, transforms, cameras, schedules  # noqa: F401
