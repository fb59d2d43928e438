"""Published-weights parity gate (VERDICT r2 next #9).

Skipped unless the published pretrained weight files are present under
$NFI_WEIGHTS_DIR (default <repo>/weights/) — this container has no
network egress, so they cannot be fetched here. The first environment
that drops the files in proves numerical parity with zero extra work:

- vgg16.pth       torchvision vgg16 features (vgg16-397923af.pth)
- lpips_lins.pth  lpips package v0.1 vgg linear heads
- pt_inception.pth  pytorch-fid TF-ported InceptionV3
                    (pt_inception-2015-12-05-6726825d.pth)
- mit_b5.pth      SegFormer MiT-B5 ImageNet weights

Fetch instructions: SETUP.md "Pretrained weights". Each file's sha256 is
checked against the published digest prefix embedded in its release
filename, so a wrong/corrupt download fails loudly instead of producing
a silently-off FID (the reference's FID is exquisitely sensitive to the
exact Inception tensors, SURVEY §7.3.1).

Parity oracle: the in-repo torch replicas (tests/test_torch_numeric_
parity.py), whose module structure matches the published packages —
loading the real tensors into both the replica and the flax model and
comparing forwards validates the converter on the actual weights.
"""

import hashlib
import os
import pathlib

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerf_from_image_tpu.utils import torch_convert as tc  # noqa: E402

WEIGHTS_DIR = pathlib.Path(
    os.environ.get('NFI_WEIGHTS_DIR',
                   pathlib.Path(__file__).parent.parent / 'weights'))

# Published sha256 prefixes (from the upstream release filenames).
KNOWN_SHA256_PREFIX = {
    'vgg16.pth': '397923af',        # torchvision vgg16-397923af.pth
    'pt_inception.pth': '6726825d',  # pt_inception-2015-12-05-6726825d.pth
}


def _need(*names):
    missing = [n for n in names if not (WEIGHTS_DIR / n).exists()]
    if missing:
        pytest.skip(f'published weights not present: {missing} '
                    f'(looked in {WEIGHTS_DIR}; see SETUP.md to fetch)')
    for n in names:
        want = KNOWN_SHA256_PREFIX.get(n)
        if want:
            digest = hashlib.sha256(
                (WEIGHTS_DIR / n).read_bytes()).hexdigest()
            assert digest.startswith(want), (
                f'{n}: sha256 {digest[:8]} != published {want} — wrong or '
                'corrupt download')


def _load_sd(name):
    with open(WEIGHTS_DIR / name, 'rb') as f:
        sd = torch.load(f, map_location='cpu')
    if isinstance(sd, dict) and 'state_dict' in sd:
        sd = sd['state_dict']
    return sd


def test_lpips_real_weights_parity():
    from tests.test_torch_numeric_parity import TorchLPIPS
    from nerf_from_image_tpu.models.lpips import LPIPS

    _need('vgg16.pth', 'lpips_lins.pth')
    vgg_sd = {k: v for k, v in _load_sd('vgg16.pth').items()
              if k.startswith('features.')}
    lin_sd_raw = _load_sd('lpips_lins.pth')
    # lpips release format: lin{i}.model.1.weight.
    lin_sd = {k: v for k, v in lin_sd_raw.items() if 'lin' in k}

    net_t = TorchLPIPS().eval()
    net_t.net.load_state_dict(vgg_sd)
    for i in range(5):
        net_t.lins[i].weight.data = lin_sd[f'lin{i}.model.1.weight'].float()

    variables = tc.convert_lpips(
        {k: v.numpy() for k, v in vgg_sd.items()},
        {k: v.numpy() for k, v in lin_sd.items()})

    rng = np.random.RandomState(0)
    a = rng.uniform(-1, 1, (2, 3, 33, 35)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, 33, 35)).astype(np.float32)
    with torch.no_grad():
        ref = net_t(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    out = np.asarray(LPIPS().apply(variables, jnp.asarray(a),
                                   jnp.asarray(b)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_inception_real_weights_parity():
    from tests.test_torch_numeric_parity import TorchFIDInception
    from nerf_from_image_tpu.models.inception import InceptionV3FID

    _need('pt_inception.pth')
    sd = {k: v for k, v in _load_sd('pt_inception.pth').items()}

    net_t = TorchFIDInception().eval()
    net_t.load_state_dict({k: v.float() for k, v in sd.items()},
                          strict=False)
    variables = tc.convert_inception(
        {k: v.numpy() for k, v in sd.items()})

    rng = np.random.RandomState(1)
    x = rng.uniform(0, 1, (2, 3, 75, 75)).astype(np.float32)
    with torch.no_grad():
        ref = net_t(torch.from_numpy(x)).numpy().reshape(2, -1)
    net = InceptionV3FID(resize_input=False)
    out = np.asarray(net.apply(variables, jnp.asarray(x))).reshape(2, -1)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_mit_b5_real_weights_forward():
    from nerf_from_image_tpu.models import segformer as seg_lib

    _need('mit_b5.pth')
    sd = {k: v.numpy() for k, v in _load_sd('mit_b5.pth').items()}
    params = tc.convert_segformer(sd)
    net = seg_lib.Segformer()
    x = jnp.asarray(np.random.RandomState(2).uniform(
        -1, 1, (1, 3, 64, 64)).astype(np.float32))
    feats = net.apply({'params': params}, x)
    for f in jax.tree_util.tree_leaves(feats):
        assert np.isfinite(np.asarray(f)).all()
