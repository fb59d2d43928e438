"""FID statistics and Fréchet distance (host-side numpy/scipy).

Protocol parity with /root/reference/lib/fid.py:41-68. Activations come
from the flax InceptionV3 port (models/inception.py) with TF-FID weights;
stats + sqrtm stay on the host exactly as the reference does.
"""

from __future__ import annotations

import numpy as np

try:
    from scipy import linalg as _scipy_linalg
except ImportError:  # pragma: no cover
    _scipy_linalg = None


def calculate_stats(act: np.ndarray):
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def _sqrtm(mat: np.ndarray) -> np.ndarray:
    if _scipy_linalg is not None:
        covmean, _ = _scipy_linalg.sqrtm(mat, disp=False)
        return covmean
    # Eigendecomposition fallback (mat is a product of PSD matrices; may be
    # slightly non-symmetric — symmetrize like the common FID practice).
    vals, vecs = np.linalg.eig(mat)
    vals = np.where(vals.real < 0, 0, vals)
    return (vecs @ np.diag(np.sqrt(vals)) @ np.linalg.inv(vecs))


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1.dot(sigma2))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f'Imaginary component {m}')
        covmean = covmean.real

    return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) -
            2 * np.trace(covmean))
