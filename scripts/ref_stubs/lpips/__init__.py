"""Stub `lpips` package for running the reference on this container.

Interface-compatible with lpips.LPIPS(net='vgg') as consumed by the
reference's lib/metrics.py:97-137 (`.net`, `.scaling_layer`, `.L`,
`.lins`, module-level `normalize_tensor`). Weights are either loaded
from the npz named by $REF_LPIPS_WEIGHTS (written by
scripts/gen_trajectory_golden.py so the rebuild can convert the exact
same tensors) or seeded-random.

This is a test harness shim, not a shipped component.
"""

import os

import numpy as np
import torch
import torch.nn as nn

VGG_CFG = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
           512, 512, 512, 'M', 512, 512, 512)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)


def normalize_tensor(x, eps=1e-10):
    norm = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
    return x / (norm + eps)


class _VGGFeatures(nn.Module):
    """torchvision vgg16 `.features` with the lpips 5-slice taps."""

    def __init__(self):
        super().__init__()
        layers = []
        cin = 3
        for v in VGG_CFG:
            if v == 'M':
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(cin, v, 3, padding=1))
                layers.append(nn.ReLU(inplace=False))
                cin = v
        self.features = nn.Sequential(*layers)
        self.taps = (3, 8, 15, 22, 29)

    def forward(self, x):
        out = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.taps:
                out.append(x)
        return out


class _ScalingLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer(
            'shift', torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1))
        self.register_buffer(
            'scale', torch.tensor([.458, .448, .450]).view(1, 3, 1, 1))

    def forward(self, x):
        return (x - self.shift) / self.scale


class LPIPS(nn.Module):
    def __init__(self, net='vgg', **kwargs):
        super().__init__()
        assert net == 'vgg', 'stub only implements the vgg backbone'
        self.net = _VGGFeatures()
        self.scaling_layer = _ScalingLayer()
        self.L = 5
        self.lins = nn.ModuleList(
            [nn.Conv2d(c, 1, 1, bias=False) for c in LPIPS_CHANNELS])
        self._load_weights()

    def _load_weights(self):
        path = os.environ.get('REF_LPIPS_WEIGHTS')
        if path and os.path.exists(path):
            data = np.load(path)
            sd = {k: torch.from_numpy(np.asarray(data[k])) for k in data}
            self.load_state_dict(sd)
        else:
            gen = torch.Generator().manual_seed(7771)
            with torch.no_grad():
                for p in self.net.parameters():
                    p.normal_(0.0, 0.05, generator=gen)
                for lin in self.lins:
                    lin.weight.uniform_(0.0, 0.2, generator=gen)

    def forward(self, a, b):
        fa = [normalize_tensor(f) for f in self.net(self.scaling_layer(a))]
        fb = [normalize_tensor(f) for f in self.net(self.scaling_layer(b))]
        total = 0.0
        for x, y, lin in zip(fa, fb, self.lins):
            total = total + lin((x - y) ** 2).mean(dim=(2, 3))
        return total
