from scgaussian_tpu.data.readers import (  # noqa: F401
    CameraInfo,
    SceneInfo,
    scene_load_callbacks,
)
