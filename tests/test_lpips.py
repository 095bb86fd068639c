"""Numeric parity of eval/lpips_jax.py vs the reference LPIPS
(`lpipsPyTorch/modules/lpips.py:30-36`, `networks.py:12-96`) with identical
random weights (VERDICT round-1 missing #1).

torchvision is not installed here, so the pretrained-backbone constructors in
the reference `networks.py` cannot be imported; instead the torch side
rebuilds the exact torchvision `features` module layouts (vgg16 cfg-D,
alexnet, squeezenet1_1) in raw torch.nn, loads the same random weights as
the JAX port, and replicates the reference forward verbatim — including the
reference's own `normalize_activation` imported from the real
`lpipsPyTorch/modules/utils.py`."""

import numpy as np
import pytest
import torch
import torch.nn as nn

# Import the reference's normalize_activation directly by file path: the
# lpipsPyTorch package __init__ pulls in torchvision (absent here), but
# modules/utils.py itself only needs torch.
import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "_ref_lpips_utils", "/root/reference/lpipsPyTorch/modules/utils.py"
)
_ref_utils = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_ref_utils)
normalize_activation = _ref_utils.normalize_activation

from scgaussian_tpu.eval import lpips_jax

SHIFT = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
SCALE = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]


class Fire(nn.Module):
    """torchvision.models.squeezenet.Fire layout."""

    def __init__(self, cin, s, e1, e3):
        super().__init__()
        self.squeeze = nn.Conv2d(cin, s, 1)
        self.expand1x1 = nn.Conv2d(s, e1, 1)
        self.expand3x3 = nn.Conv2d(s, e3, 3, padding=1)
        self.relu = nn.ReLU(inplace=False)

    def forward(self, x):
        x = self.relu(self.squeeze(x))
        return torch.cat(
            [self.relu(self.expand1x1(x)), self.relu(self.expand3x3(x))], 1
        )


def _vgg_torch():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
           512, 512, 512]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU()]
            cin = v
    return nn.Sequential(*layers), [4, 9, 16, 23, 30]  # networks.py:93


def _alex_torch():
    layers = [
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(), nn.MaxPool2d(3, 2),
    ]
    return nn.Sequential(*layers), [2, 5, 8, 10, 12]  # networks.py:81


def _squeeze_torch():
    layers = [
        nn.Conv2d(3, 64, 3, 2), nn.ReLU(), nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(64, 16, 64, 64), Fire(128, 16, 64, 64),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(128, 32, 128, 128), Fire(256, 32, 128, 128),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(256, 48, 192, 192), Fire(384, 48, 192, 192),
        Fire(384, 64, 256, 256), Fire(512, 64, 256, 256),
    ]
    return nn.Sequential(*layers), [2, 5, 8, 10, 11, 12, 13]  # networks.py:70


def _randomize(module, rng):
    params = {}
    ci = fi = 0
    for layer in module:
        if isinstance(layer, nn.Conv2d):
            w = rng.normal(size=layer.weight.shape, scale=0.2).astype(np.float32)
            b = rng.normal(size=layer.bias.shape, scale=0.1).astype(np.float32)
            layer.weight.data = torch.from_numpy(w)
            layer.bias.data = torch.from_numpy(b)
            params[f"conv{ci}_w"], params[f"conv{ci}_b"] = w, b
            ci += 1
        elif isinstance(layer, Fire):
            for attr, key in (("squeeze", "squeeze"), ("expand1x1", "e1"),
                              ("expand3x3", "e3")):
                conv = getattr(layer, attr)
                w = rng.normal(size=conv.weight.shape, scale=0.2).astype(np.float32)
                b = rng.normal(size=conv.bias.shape, scale=0.1).astype(np.float32)
                conv.weight.data = torch.from_numpy(w)
                conv.bias.data = torch.from_numpy(b)
                params[f"fire{fi}_{key}_w"], params[f"fire{fi}_{key}_b"] = w, b
            fi += 1
    return params


def _reference_lpips(module, target_layers, lin_ws, x, y):
    """Verbatim reference forward: BaseNet.forward (networks.py:52-61) +
    LPIPS.forward (lpips.py:30-36) with 1x1 no-bias lin convs."""

    def feats(t):
        t = (t - SHIFT) / SCALE
        out = []
        for i, layer in enumerate(module, 1):
            t = layer(t)
            if i in target_layers:
                out.append(normalize_activation(t))
            if len(out) == len(target_layers):
                break
        return out

    fx, fy = feats(x), feats(y)
    diff = [(a - b) ** 2 for a, b in zip(fx, fy)]
    res = [
        torch.nn.functional.conv2d(d, torch.from_numpy(w)).mean((2, 3), True)
        for d, w in zip(diff, lin_ws)
    ]
    return torch.sum(torch.cat(res, 0), 0, True)


@pytest.mark.parametrize("net", ["vgg", "alex", "squeeze"])
def test_lpips_parity_random_weights(net, tmp_path):
    rng = np.random.default_rng(hash(net) % 2**31)
    module, targets = {
        "vgg": _vgg_torch, "alex": _alex_torch, "squeeze": _squeeze_torch
    }[net]()
    params = _randomize(module, rng)
    n_taps = len(targets)
    chans = {
        "vgg": [64, 128, 256, 512, 512],
        "alex": [64, 192, 384, 256, 256],
        "squeeze": [64, 128, 256, 384, 384, 512, 512],
    }[net]
    lin_ws = [
        np.abs(rng.normal(size=(1, c, 1, 1), scale=0.05)).astype(np.float32)
        for c in chans
    ]
    for i, w in enumerate(lin_ws):
        params[f"lin{i}_w"] = w

    path = str(tmp_path / f"lpips_{net}.npz")
    np.savez(path, **params)

    H = W = 64
    x = rng.uniform(size=(1, 3, H, W)).astype(np.float32)
    y = np.clip(x + rng.normal(size=x.shape, scale=0.1).astype(np.float32), 0, 1)

    with torch.no_grad():
        ref = _reference_lpips(
            module, targets, lin_ws, torch.from_numpy(x), torch.from_numpy(y)
        )
    ref_val = float(ref.reshape(-1)[0])

    import jax.numpy as jnp

    ours = float(lpips_jax.LPIPS(net, weights_path=path)(jnp.asarray(x), jnp.asarray(y))[0])
    assert abs(ours - ref_val) <= 1e-4 * max(abs(ref_val), 1e-3), (ours, ref_val)
