"""Stub pytorch_fid.inception for running the reference on this container.

The reference (lib/fid.py:22-38) only needs a module returning a list
with one (N, 2048, 1, 1) activation block. Trajectory goldens never
assert FID values, so this is a tiny deterministic feature extractor,
NOT an InceptionV3 replica (the rebuild's FID-Inception parity is tested
separately in tests/test_torch_numeric_parity.py). It is deliberately
cheap: the reference computes startup FID stats over the whole eval
split unconditionally (run.py:403-404).
"""

import torch
import torch.nn as nn


class InceptionV3(nn.Module):
    BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}

    def __init__(self, output_blocks=(3,), use_fid_inception=True,
                 **kwargs):
        super().__init__()
        self.output_blocks = list(output_blocks)
        gen = torch.Generator().manual_seed(4242)
        conv = nn.Conv2d(3, 32, 3, stride=4)
        lin = nn.Linear(32, 2048)
        with torch.no_grad():
            conv.weight.normal_(0, 0.1, generator=gen)
            conv.bias.zero_()
            lin.weight.normal_(0, 0.1, generator=gen)
            lin.bias.zero_()
        self.conv = conv
        self.lin = lin

    def forward(self, x):
        h = torch.relu(self.conv(x)).mean(dim=(2, 3))
        feat = self.lin(h)[..., None, None]
        return [feat]
