"""Numerical LPIPS / FID-Inception parity against independent torch
replicas (VERDICT r1 #4).

The real `lpips` / `pytorch-fid` packages (and their pretrained weights)
are not installable in this container, so these tests rebuild the two
architectures in PyTorch — module/key structure copied from those
packages' public definitions (lpips.LPIPS(net='vgg'),
pytorch_fid.inception.InceptionV3 with use_fid_inception=True) — load
RANDOM weights, convert the torch state dicts through
utils/torch_convert, and assert the flax forward matches the torch
forward to <=1e-4 in f32. This validates the converter's key mapping and
every architectural quirk (bn eps 1e-3, count_include_pad=False average
pools, the Mixed_7c max pool, LPIPS scaling/normalization) numerically;
only the literal pretrained tensors remain un-checked (they enter
through the same verified mapping).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerf_from_image_tpu.utils import torch_convert as tc  # noqa: E402


# ---------------------------------------------------------------------------
# LPIPS (vgg) torch replica — structure of lpips.LPIPS(net='vgg').
# ---------------------------------------------------------------------------

VGG_CFG = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
           512, 512, 512, 'M', 512, 512, 512)


class TorchVGGFeatures(tnn.Module):
    """torchvision vgg16 `.features` with the lpips 5-slice taps."""

    def __init__(self):
        super().__init__()
        layers = []
        cin = 3
        for v in VGG_CFG:
            if v == 'M':
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(cin, v, 3, padding=1))
                layers.append(tnn.ReLU(inplace=False))
                cin = v
        self.features = tnn.Sequential(*layers)
        # relu taps AFTER: relu1_2 (idx 3), relu2_2 (8), relu3_3 (15),
        # relu4_3 (22), relu5_3 (29).
        self.taps = (3, 8, 15, 22, 29)

    def forward(self, x):
        out = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.taps:
                out.append(x)
        return out


class TorchLPIPS(tnn.Module):
    def __init__(self):
        super().__init__()
        self.net = TorchVGGFeatures()
        self.register_buffer(
            'shift', torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1))
        self.register_buffer(
            'scale', torch.tensor([.458, .448, .450]).view(1, 3, 1, 1))
        chans = (64, 128, 256, 512, 512)
        self.lins = tnn.ModuleList(
            [tnn.Conv2d(c, 1, 1, bias=False) for c in chans])

    @staticmethod
    def _normalize(x, eps=1e-10):
        n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
        return x / (n + eps)

    def forward(self, a, b):
        a = (a - self.shift) / self.scale
        b = (b - self.shift) / self.scale
        fa = [self._normalize(f) for f in self.net(a)]
        fb = [self._normalize(f) for f in self.net(b)]
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            total = total + self.lins[i]((x - y) ** 2).mean(dim=(2, 3))
        return total


def test_lpips_matches_torch_replica():
    from nerf_from_image_tpu.models.lpips import LPIPS

    torch.manual_seed(0)
    net_t = TorchLPIPS().eval()
    with torch.no_grad():
        for lin in net_t.lins:  # lpips weights are non-negative
            lin.weight.abs_()

    sd = net_t.state_dict()
    vgg_sd = {k.replace('net.features.', 'features.'): v.numpy()
              for k, v in sd.items() if k.startswith('net.features.')}
    lin_sd = {f'lin{i}.model.1.weight': net_t.lins[i].weight.detach().numpy()
              for i in range(5)}
    variables = tc.convert_lpips(vgg_sd, lin_sd)

    rng = np.random.RandomState(0)
    a = rng.uniform(-1, 1, (2, 3, 33, 35)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, 33, 35)).astype(np.float32)
    with torch.no_grad():
        ref = net_t(torch.from_numpy(a), torch.from_numpy(b)).numpy()

    lpips = LPIPS()
    out = np.asarray(lpips.apply(variables, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# FID-Inception torch replica — structure of pytorch_fid's InceptionV3
# (torchvision inception blocks with the FID pooling tweaks).
# ---------------------------------------------------------------------------

class TBasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        bp = F.avg_pool2d(x, 3, stride=1, padding=1,
                          count_include_pad=False)  # FID tweak
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(bp)], 1)


class TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(
                self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2)], 1)


class TInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        bp = F.avg_pool2d(x, 3, stride=1, padding=1,
                          count_include_pad=False)  # FID tweak
        return torch.cat([
            self.branch1x1(x),
            self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x))),
            self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x))))),
            self.branch_pool(bp)], 1)


class TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2)], 1)


class TInceptionE(tnn.Module):
    def __init__(self, cin, pool='avg'):
        super().__init__()
        self.pool = pool
        self.branch1x1 = TBasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3,
                                           padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        if self.pool == 'avg':  # FIDInceptionE_1
            bp = F.avg_pool2d(x, 3, stride=1, padding=1,
                              count_include_pad=False)
        else:  # FIDInceptionE_2 (Mixed_7c): max pool
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TorchFIDInception(tnn.Module):
    """pytorch-fid InceptionV3(use_fid_inception=True) up to pool3."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, 'avg')
        self.Mixed_7c = TInceptionE(2048, 'max')

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for blk in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                    self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                    self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                    self.Mixed_7b, self.Mixed_7c):
            x = blk(x)
        return x.mean(dim=(2, 3))  # (B, 2048)


@pytest.mark.slow
def test_fid_inception_matches_torch_replica():
    from nerf_from_image_tpu.models.inception import InceptionV3FID

    torch.manual_seed(1)
    net_t = TorchFIDInception().eval()
    # Random-but-sane bn stats so normalization actually does something.
    with torch.no_grad():
        for m in net_t.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    variables = tc.convert_inception(
        {k: v.numpy() for k, v in net_t.state_dict().items()})

    rng = np.random.RandomState(1)
    # 75x75 is pytorch-fid's minimum un-resized input.
    x01 = rng.uniform(0, 1, (2, 3, 75, 75)).astype(np.float32)
    with torch.no_grad():
        ref = net_t(torch.from_numpy(x01) * 2 - 1).numpy()

    net_j = InceptionV3FID(resize_input=False)
    out = np.asarray(net_j.apply(variables, jnp.asarray(x01)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
