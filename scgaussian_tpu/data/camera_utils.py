"""CameraInfo -> device-ready training camera, with resolution logic.

Equivalent of `utils/camera_utils.py:20-102` + `scene/cameras.py:19-72`: the
torch `Camera(nn.Module)` becomes a host record (`LoadedCamera`) holding the
numpy image/masks plus the jit-ready `Camera` pytree and the full-resolution
K / w2c used by the match machinery."""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
from PIL import Image

import jax.numpy as jnp

from scgaussian_tpu.core.cameras import Camera, fov2focal, intrinsic_matrix

_WARNED = False


@dataclasses.dataclass
class LoadedCamera:
    camera: Camera  # pytree for the renderer (at loaded resolution)
    uid: int
    colmap_id: int
    image_name: Optional[str]
    R: np.ndarray
    T: np.ndarray
    fovx: float
    fovy: float
    image: Optional[np.ndarray]  # [3, H, W] float32 in [0, 1], clamped
    dtumask: Optional[np.ndarray]  # [H, W] float32
    blendermask: Optional[np.ndarray]  # [H, W] float32
    near_far: Optional[np.ndarray]

    @property
    def width(self) -> int:
        return self.camera.width

    @property
    def height(self) -> int:
        return self.camera.height

    def gt_image(self) -> jnp.ndarray:
        return jnp.asarray(self.image)


def _pil_to_np(pil_image: Image.Image, resolution) -> np.ndarray:
    """PILtoTorch equivalent (`utils/general_utils.py:22-28`): resize then
    [C, H, W] float in [0, 1]."""
    resized = pil_image.resize(resolution)
    arr = np.array(resized).astype(np.float32) / 255.0
    if arr.ndim == 3:
        return arr.transpose(2, 0, 1)
    return arr[None]


def load_cam(resolution_arg: int, uid: int, info, resolution_scale: float = 1.0) -> LoadedCamera:
    """`loadCam` (`utils/camera_utils.py:20-72`): divisor resolutions
    {1,2,4,8} or width-based downscale with the >1600px auto clamp."""
    global _WARNED
    import cv2

    if info.image is not None:
        orig_w, orig_h = info.image.size
        if resolution_arg in (1, 2, 4, 8):
            resolution = (
                round(orig_w / (resolution_scale * resolution_arg)),
                round(orig_h / (resolution_scale * resolution_arg)),
            )
        else:
            if resolution_arg == -1:
                if orig_w > 1600:
                    if not _WARNED:
                        print(
                            "[ INFO ] Encountered quite large input images "
                            "(>1.6K pixels width), rescaling to 1.6K."
                        )
                        _WARNED = True
                    global_down = orig_w / 1600
                else:
                    global_down = 1
            else:
                global_down = orig_w / resolution_arg
            scale = float(global_down) * float(resolution_scale)
            resolution = (int(orig_w / scale), int(orig_h / scale))

        rgb = _pil_to_np(info.image, resolution)
        gt = np.clip(rgb[:3], 0.0, 1.0)
        if rgb.shape[0] == 4:
            gt = gt * rgb[3:4]
        blendermask = info.blendermask
        if blendermask is not None:
            blendermask = cv2.resize(blendermask.astype(np.float32), resolution)
        dtumask = info.dtumask
        if dtumask is not None:
            dtumask = cv2.resize(dtumask.astype(np.float32), resolution)
        width, height = resolution
    else:
        gt = None
        blendermask = None
        dtumask = None
        width, height = info.width, info.height
        if resolution_arg in (1, 2, 4, 8):
            width = int(width / resolution_arg)
            height = int(height / resolution_arg)

    cam = Camera.create(info.R, info.T, info.fovx, info.fovy, width, height)
    return LoadedCamera(
        camera=cam,
        uid=uid,
        colmap_id=info.uid,
        image_name=info.image_name,
        R=info.R,
        T=info.T,
        fovx=info.fovx,
        fovy=info.fovy,
        image=gt,
        dtumask=dtumask,
        blendermask=blendermask,
        near_far=info.near_far,
    )


def camera_list_from_infos(infos: List, resolution_arg: int, resolution_scale: float = 1.0):
    return [load_cam(resolution_arg, i, c, resolution_scale) for i, c in enumerate(infos)]


def camera_to_json(id: int, cam: LoadedCamera) -> dict:
    """`camera_to_JSON` (`utils/camera_utils.py:82-102`)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = cam.R.transpose()
    Rt[:3, 3] = cam.T
    Rt[3, 3] = 1.0
    w2c = np.linalg.inv(Rt)
    return {
        "id": id,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": w2c[:3, 3].tolist(),
        "rotation": [r.tolist() for r in w2c[:3, :3]],
        "fy": fov2focal(cam.fovy, cam.height),
        "fx": fov2focal(cam.fovx, cam.width),
    }
