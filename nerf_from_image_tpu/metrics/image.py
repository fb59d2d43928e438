"""Image metrics: PSNR, SSIM, IoU — all on-device JAX (no CPU hop).

Protocol parity with /root/reference/lib/metrics.py:30-94:
- PSNR: MSE over CHW of [0,1]-clamped images, per-image clamp at 60 dB.
- SSIM: structural_similarity with skimage defaults (uniform 7x7 window,
  channel_axis=0, data_range=1, K1=0.01, K2=0.03) — reimplemented in JAX so
  eval stays on the TPU (the reference hops to CPU/skimage).
- IoU: binarize at 0.5, (|inter| + eps) / (|union| + eps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         reduction: str = 'mean') -> jnp.ndarray:
    """pred/target: (B, C, H, W) or (B, H, W, C) in [0, 1]."""
    assert pred.shape == target.shape and pred.ndim == 4
    pred = jnp.clip(pred, 0.0, 1.0)
    target = jnp.clip(target, 0.0, 1.0)
    mse = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3))
    out = jnp.minimum(-10.0 * jnp.log10(mse), 60.0)
    return jnp.mean(out) if reduction == 'mean' else out


def _uniform_filter_2d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """skimage-style uniform filter with 'reflect' boundary, valid center.

    x: (..., H, W). Uses two separable cumulative means.
    """
    pad = size // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)],
                 mode='reflect')
    # Separable box filter: windowed sum = c[i+size-1] - c[i-1] on the
    # zero-prepended cumsum.
    def box1d(v, axis):
        c = jnp.cumsum(v, axis=axis)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
        cpad = jnp.concatenate((zero, c), axis=axis)
        win = (jax.lax.slice_in_dim(cpad, size, cpad.shape[axis], axis=axis) -
               jax.lax.slice_in_dim(cpad, 0, cpad.shape[axis] - size,
                                    axis=axis))
        return win / size

    return box1d(box1d(xp, -1), -2)


def ssim(pred: jnp.ndarray, target: jnp.ndarray,
         reduction: str = 'mean') -> jnp.ndarray:
    """SSIM with skimage `structural_similarity` defaults.

    pred/target: (B, 3, H, W) in [0, 1]. reduction='mean' averages over the
    whole batch as one stack (matching lib/metrics.py:57-65, which flattens
    batch and channels); 'none' returns per-image values.
    """
    assert pred.shape == target.shape and pred.ndim == 4
    pred = jnp.clip(pred.astype(jnp.float64)
                    if jax.config.jax_enable_x64 else pred, 0.0, 1.0)
    target = jnp.clip(target, 0.0, 1.0)

    win = 7
    k1, k2 = 0.01, 0.03
    data_range = 1.0
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    # skimage uses unbiased covariance normalization: cov_norm = n/(n-1).
    n = win * win
    cov_norm = n / (n - 1.0)

    ux = _uniform_filter_2d(pred, win)
    uy = _uniform_filter_2d(target, win)
    uxx = _uniform_filter_2d(pred * pred, win)
    uyy = _uniform_filter_2d(target * target, win)
    uxy = _uniform_filter_2d(pred * target, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2))

    # skimage crops win//2 border before averaging.
    pad = win // 2
    s = s[..., pad:-pad, pad:-pad]
    if reduction == 'mean':
        return jnp.mean(s)
    return jnp.mean(s, axis=(1, 2, 3))


def iou(alpha_pred: jnp.ndarray, alpha_real: jnp.ndarray,
        reduction: str = 'mean') -> jnp.ndarray:
    """alpha_*: (B, H, W) or (B, 1, H, W) in [0, 1]."""
    p = alpha_pred > 0.5
    r = alpha_real > 0.5
    inter = jnp.sum((p & r).astype(jnp.float32), axis=(-2, -1))
    union = jnp.sum((p | r).astype(jnp.float32), axis=(-2, -1))
    eps = 1e-6
    out = (inter + eps) / (union + eps)
    return jnp.mean(out) if reduction == 'mean' else out.reshape(-1)
