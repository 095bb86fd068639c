"""LPIPS perceptual metric in JAX (VGG16 / AlexNet / SqueezeNet towers).

JAX port of the reference's self-contained lpipsPyTorch
(`lpipsPyTorch/modules/lpips.py:8-36`, `networks.py:12-96`,
`utils.py:11-30`): input [-1, 1] images are shifted/scaled by the ImageNet
statistics, passed through the frozen backbone, each tap unit-normalized
along channels, squared-differenced, weighted by learned 1x1 "lin" heads and
spatially averaged, then summed over taps.

Weights: this environment has no network egress and no cached torchvision /
richzhang checkpoints, so weights load from a local file:
  - set SCGAUSSIAN_LPIPS_WEIGHTS=/path/to/lpips_<net>.npz, or pass
    weights_path. `convert_torch_weights` turns the torchvision backbone +
    richzhang lin .pth into that .npz on any connected machine.
Without weights, `lpips_available()` is False and metrics report null for
LPIPS (PSNR/SSIM/AVG-without-LPIPS still computed).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ENV_VAR = "SCGAUSSIAN_LPIPS_WEIGHTS"

# ImageNet scaling used by LPIPS v0.1 (lpipsPyTorch/modules/utils.py)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv layout: (out_channels per conv, 'M' = maxpool). LPIPS taps after
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
_VGG_TAPS = [1, 3, 6, 9, 12]  # conv indices (0-based) after which to tap (post-relu)

# AlexNet features: conv(64,k11,s4,p2) M conv(192,k5,p2) M conv(384,k3,p1)
# conv(256,k3,p1) conv(256,k3,p1); taps after each relu.
_ALEX_CFG = [
    (64, 11, 4, 2),
    "M",
    (192, 5, 1, 2),
    "M",
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_ALEX_TAPS = [0, 1, 2, 3, 4]

# SqueezeNet 1.1 features (reference `lpipsPyTorch/modules/networks.py:66-73`:
# squeezenet1_1 with target layers [2,5,8,10,11,12,13] 1-based == the outputs
# of relu0, fire2, fire4, fire5, fire6, fire7, fire8). Fire(s, e1, e3) =
# squeeze 1x1 conv -> relu -> [expand 1x1 + expand 3x3(pad 1), both relu'd,
# channel-concatenated]. Maxpools are k3 s2 ceil_mode like torchvision.
_SQUEEZE_CFG = [
    ("conv", 64, 3, 2, 0),
    "M",
    ("fire", 16, 64, 64),
    ("fire", 16, 64, 64),
    "M",
    ("fire", 32, 128, 128),
    ("fire", 32, 128, 128),
    "M",
    ("fire", 48, 192, 192),
    ("fire", 48, 192, 192),
    ("fire", 64, 256, 256),
    ("fire", 64, 256, 256),
]
# taps as (kind, index): output of conv0's relu + fires 2,4,5,6,7,8 (1-based)
_SQUEEZE_TAPS = [("conv", 0), ("fire", 1), ("fire", 3), ("fire", 4),
                 ("fire", 5), ("fire", 6), ("fire", 7)]


def _conv2d(x, w, b, stride=1, padding=0):
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def _maxpool3(x):
    """torch MaxPool2d(kernel_size=3, stride=2) (alexnet, floor mode)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def _maxpool3_ceil(x):
    """torch MaxPool2d(kernel_size=3, stride=2, ceil_mode=True) (squeezenet)."""
    h, w = x.shape[2], x.shape[3]

    def pad_for(n):
        out = -(-(n - 3) // 2) + 1  # ceil((n-3)/2) + 1
        return max((out - 1) * 2 + 3 - n, 0)

    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (0, pad_for(h)), (0, pad_for(w))],
    )


def _vgg_features(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> List[jnp.ndarray]:
    feats = []
    ci = 0
    for item in _VGG_CFG:
        if item == "M":
            x = _maxpool(x)
        else:
            x = _conv2d(x, params[f"conv{ci}_w"], params[f"conv{ci}_b"], padding=1)
            x = jax.nn.relu(x)
            if ci in _VGG_TAPS:
                feats.append(x)
            ci += 1
    return feats


def _alex_features(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> List[jnp.ndarray]:
    feats = []
    ci = 0
    for item in _ALEX_CFG:
        if item == "M":
            x = _maxpool3(x)
        else:
            _, k, s, p = item
            x = _conv2d(x, params[f"conv{ci}_w"], params[f"conv{ci}_b"], stride=s, padding=p)
            x = jax.nn.relu(x)
            if ci in _ALEX_TAPS:
                feats.append(x)
            ci += 1
    return feats


def _fire(params: Dict[str, jnp.ndarray], i: int, x: jnp.ndarray) -> jnp.ndarray:
    s = jax.nn.relu(_conv2d(x, params[f"fire{i}_squeeze_w"], params[f"fire{i}_squeeze_b"]))
    e1 = jax.nn.relu(_conv2d(s, params[f"fire{i}_e1_w"], params[f"fire{i}_e1_b"]))
    e3 = jax.nn.relu(_conv2d(s, params[f"fire{i}_e3_w"], params[f"fire{i}_e3_b"], padding=1))
    return jnp.concatenate([e1, e3], axis=1)


def _squeeze_features(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> List[jnp.ndarray]:
    taps = set(_SQUEEZE_TAPS)
    feats = []
    fi = 0
    for item in _SQUEEZE_CFG:
        if item == "M":
            x = _maxpool3_ceil(x)
        elif item[0] == "conv":
            _, c, k, s, p = item
            x = jax.nn.relu(_conv2d(x, params["conv0_w"], params["conv0_b"], stride=s, padding=p))
            if ("conv", 0) in taps:
                feats.append(x)
        else:
            x = _fire(params, fi, x)
            if ("fire", fi) in taps:
                feats.append(x)
            fi += 1
    return feats


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
    return x / (norm + eps)


class LPIPS:
    """Callable LPIPS metric. Construct once; weights live on device."""

    def __init__(self, net: str = "vgg", weights_path: Optional[str] = None):
        path = weights_path or os.environ.get(_ENV_VAR)
        if path is None or not os.path.exists(path or ""):
            raise FileNotFoundError(
                f"LPIPS weights not found (set ${_ENV_VAR} or pass weights_path); "
                "use convert_torch_weights() on a connected machine."
            )
        data = np.load(path)
        self.net = net
        self.params = {k: jnp.asarray(v) for k, v in data.items()}
        self._fn = jax.jit(self._forward)

    def _forward(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """x, y: [B, 3, H, W] in [-1, 1] (reference lpips() convention —
        metrics.py passes [0,1] images through lpips which internally expects
        the richzhang normalization; the reference scales inside)."""
        shift = jnp.asarray(_SHIFT)[None, :, None, None]
        scale = jnp.asarray(_SCALE)[None, :, None, None]
        xn = (x - shift) / scale
        yn = (y - shift) / scale
        feat_fn = {
            "vgg": _vgg_features,
            "alex": _alex_features,
            "squeeze": _squeeze_features,
        }[self.net]
        fx = feat_fn(self.params, xn)
        fy = feat_fn(self.params, yn)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
            w = self.params[f"lin{i}_w"]  # [1, C, 1, 1]
            total = total + jnp.mean(jnp.sum(d * w, axis=1, keepdims=True), axis=(2, 3))
        return total[:, 0]

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        return self._fn(x, y)


def lpips_available(net: str = "vgg", weights_path: Optional[str] = None) -> bool:
    path = weights_path or os.environ.get(_ENV_VAR)
    return bool(path) and os.path.exists(path)


def convert_torch_weights(out_path: str, net: str = "vgg") -> None:
    """One-time converter (run on a machine with torchvision + richzhang
    weights available): exports backbone convs + lin heads to .npz."""
    import torch
    import torchvision

    if net == "vgg":
        tv = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
        n_taps = 5
    elif net == "alex":
        tv = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
        n_taps = 5
    else:
        tv = torchvision.models.squeezenet1_1(weights="IMAGENET1K_V1").features
        n_taps = 7

    params = {}
    if net == "squeeze":
        fi = 0
        for layer in tv:
            if isinstance(layer, torch.nn.Conv2d):
                params["conv0_w"] = layer.weight.detach().numpy()
                params["conv0_b"] = layer.bias.detach().numpy()
            elif hasattr(layer, "squeeze"):  # Fire module
                for attr, key in (
                    ("squeeze", "squeeze"), ("expand1x1", "e1"), ("expand3x3", "e3"),
                ):
                    conv = getattr(layer, attr)
                    params[f"fire{fi}_{key}_w"] = conv.weight.detach().numpy()
                    params[f"fire{fi}_{key}_b"] = conv.bias.detach().numpy()
                fi += 1
    else:
        ci = 0
        for layer in tv:
            if isinstance(layer, torch.nn.Conv2d):
                params[f"conv{ci}_w"] = layer.weight.detach().numpy()
                params[f"conv{ci}_b"] = layer.bias.detach().numpy()
                ci += 1

    url = (
        "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
        f"master/lpips/weights/v0.1/{net}.pth"
    )
    lin = torch.hub.load_state_dict_from_url(url, progress=False, map_location="cpu")
    for i in range(n_taps):
        params[f"lin{i}_w"] = lin[f"lin{i}.model.1.weight"].numpy()
    np.savez(out_path, **params)
