"""Torch-side oracles for end-to-end parity tests against the reference.

The reference models (/root/reference/packages/models/) need two things
this image lacks:

- torchvision (for `models.resnet18(pretrained=False)` in AV_Net.py:25 and
  Video_Net.py:18): `TorchResNet18` below is a from-scratch torch
  ResNet-18 with torchvision's exact topology, child order, and parameter
  naming, installed as a fake `torchvision.models` module so the reference
  classes import and run unmodified.
- torch<=1.7 FFT APIs (`torch.rfft`/`torch.irfft` in
  compact_bilinear_pooling.py:152-215, plus the old positional
  `torch.addcmul(input, value, t1, t2)` form): `install_legacy_torch_shims`
  maps them onto the modern torch.fft namespace.

These are test oracles only — nothing here is part of the framework.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


class _BasicBlock(nn.Module):
    """torchvision BasicBlock topology and submodule naming."""

    def __init__(self, cin: int, cout: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, stride=1, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet18(nn.Module):
    """ResNet-18 with torchvision's child order (conv1, bn1, relu, maxpool,
    layer1-4, avgpool, fc) so `nn.Sequential(*list(m.children())[:-1])`
    (AV_Net.py:27-29) produces the same 'features.N.*' state-dict keys."""

    def __init__(self, num_classes: int = 1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = nn.Sequential(_BasicBlock(64, 64), _BasicBlock(64, 64))
        self.layer2 = nn.Sequential(_BasicBlock(64, 128, 2),
                                    _BasicBlock(128, 128))
        self.layer3 = nn.Sequential(_BasicBlock(128, 256, 2),
                                    _BasicBlock(256, 256))
        self.layer4 = nn.Sequential(_BasicBlock(256, 512, 2),
                                    _BasicBlock(512, 512))
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        return self.fc(torch.flatten(x, 1))


def install_fake_torchvision():
    """Register a minimal torchvision module exposing resnet18."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    mm = types.ModuleType("torchvision.models")
    mm.resnet18 = lambda pretrained=False, **kw: TorchResNet18()
    tv.models = mm
    # Video_Net.py:9 imports transforms but never uses it
    tr = types.ModuleType("torchvision.transforms")
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = mm
    sys.modules["torchvision.transforms"] = tr


def install_legacy_torch_shims(monkeypatch):
    """torch.rfft / torch.irfft / positional addcmul as of torch<=1.7."""

    def rfft(input, signal_ndim, normalized=False, onesided=True):
        assert signal_ndim == 1 and onesided and not normalized
        f = torch.fft.rfft(input, dim=-1)
        return torch.stack((f.real, f.imag), dim=-1)

    def irfft(input, signal_ndim, normalized=False, onesided=True,
              signal_sizes=None):
        assert signal_ndim == 1 and onesided and not normalized
        c = torch.complex(input.select(-1, 0).contiguous(),
                          input.select(-1, 1).contiguous())
        return torch.fft.irfft(c, n=signal_sizes[0], dim=-1)

    orig_addcmul = torch.addcmul

    def addcmul(input, *args, **kw):
        if len(args) == 3:  # legacy (input, value, tensor1, tensor2)
            value, t1, t2 = args
            return orig_addcmul(input, t1, t2, value=value)
        return orig_addcmul(input, *args, **kw)

    monkeypatch.setattr(torch, "rfft", rfft, raising=False)
    monkeypatch.setattr(torch, "irfft", irfft, raising=False)
    monkeypatch.setattr(torch, "addcmul", addcmul)


def randomize_batchnorms(module: nn.Module, rng: np.random.Generator):
    """Give every BatchNorm non-trivial affine params AND running stats so
    eval-mode parity actually exercises the BN import path."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            n = m.num_features
            m.weight.data = torch.from_numpy(
                rng.uniform(0.5, 1.5, n).astype(np.float32))
            m.bias.data = torch.from_numpy(
                rng.normal(0, 0.2, n).astype(np.float32))
            m.running_mean.data = torch.from_numpy(
                rng.normal(0, 0.3, n).astype(np.float32))
            m.running_var.data = torch.from_numpy(
                rng.uniform(0.5, 2.0, n).astype(np.float32))


def state_dict_numpy(module: nn.Module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
