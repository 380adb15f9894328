"""Run the ORIGINAL reference PyTorch code as a numerical oracle.

torchvision is not installed in this image, so we register a minimal stub
(``vgg19().features`` with the standard torchvision layer layout, plus a
``kornia.filters.GaussianBlur2d`` equivalent) and then import the reference
modules from /root/reference unmodified.  Our model exports its weights into
the reference ``state_dict`` schema via ``to_reference_state_dict``, so both
frameworks run identical parameters — any output mismatch is a bug in the
TPU re-implementation.  (The reference is imported read-only, never copied.)
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF = "/root/reference"

#: torchvision vgg19 ``features`` conv layout: (index, cin, cout); pools at
#: 4, 9, 18, 27, 36 — we only need layers [0, 21) but build the full stack so
#: any slice indexing works.
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _build_vgg19_features() -> nn.Sequential:
    layers = []
    cin = 3
    for v in _VGG19_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(cin, v, kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            cin = v
    return nn.Sequential(*layers)


class _GaussianBlur2d:
    """kornia.filters.GaussianBlur2d stand-in (reflect border, same kernel)."""

    def __init__(self, kernel_size, sigma):
        kh, kw = kernel_size
        sh, sw = sigma

        def k1d(k, s):
            x = torch.arange(k, dtype=torch.float64) - k // 2
            g = torch.exp(-(x * x) / (2 * s * s))
            return (g / g.sum()).float()

        self.kh, self.kw = kh, kw
        self.ky = k1d(kh, sh)
        self.kx = k1d(kw, sw)

    def __call__(self, x):
        import torch.nn.functional as F

        c = x.shape[1]
        ky = self.ky.view(1, 1, self.kh, 1).expand(c, 1, self.kh, 1)
        kx = self.kx.view(1, 1, 1, self.kw).expand(c, 1, 1, self.kw)
        x = F.pad(x, (0, 0, self.kh // 2, self.kh - 1 - self.kh // 2),
                  mode="reflect")
        x = F.conv2d(x, ky, groups=c)
        x = F.pad(x, (self.kw // 2, self.kw - 1 - self.kw // 2, 0, 0),
                  mode="reflect")
        return F.conv2d(x, kx, groups=c)


def install_stubs():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    utils = types.ModuleType("torchvision.utils")

    class _VGG:
        def __init__(self):
            self.features = _build_vgg19_features()

    def vgg19(pretrained=False, **kw):
        return _VGG()

    models.vgg19 = vgg19
    utils.save_image = lambda *a, **k: None
    tv.models = models
    tv.utils = utils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.utils"] = utils

    kornia = types.ModuleType("kornia")
    kfilters = types.ModuleType("kornia.filters")
    kfilters.GaussianBlur2d = _GaussianBlur2d
    kornia.filters = kfilters
    sys.modules["kornia"] = kornia
    sys.modules["kornia.filters"] = kfilters


def import_ref(module: str, subdir: str):
    """Import a reference module (e.g. 'style_network_global' from 'test')."""
    install_stubs()
    path = f"{REF}/{subdir}"
    if path not in sys.path:
        sys.path.insert(0, path)
    import importlib

    return importlib.import_module(module)


def load_global_net(state_dict_np):
    """Reference test/style_network_global.TransformerNet with our weights."""
    mod = import_ref("style_network_global", "test")
    net = mod.TransformerNet()
    net.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                         for k, v in state_dict_np.items()})
    net.eval()
    for p in net.parameters():
        p.requires_grad = False
    return net


def load_frame_net(state_dict_np):
    """Reference test/style_network_frame.TransformerNet with our weights."""
    mod = import_ref("style_network_frame", "test")
    net = mod.TransformerNet()
    net.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                         for k, v in state_dict_np.items()})
    net.eval()
    for p in net.parameters():
        p.requires_grad = False
    return net


def nchw(x_nhwc) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)
