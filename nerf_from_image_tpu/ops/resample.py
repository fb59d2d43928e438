"""Bilinear 2x resampling as separable shift-adds (TPU VPU path).

The reference implements StyleGAN2's 1-3-3-1 resampling as dense 4x4
convolutions (models/stylegan.py:22-111). A 1-channel depthwise conv is
pathological on the MXU (1/128^2 utilization), so here each op is the
polyphase / shift-add decomposition of the same filter: pure elementwise
multiply-adds over shifted slices, which XLA fuses onto the VPU. All ops
are numerically identical to the conv formulation (golden-tested) and
differentiate freely (their VJPs are again shift-adds, matching the
reference's EfficientResample gradient since the filter is symmetric).

Filter taps: f = [1, 3, 3, 1] / 8 per axis (2-D kernel = outer(f, f)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Per-axis taps of the separable bilinear filter.
_F = (0.125, 0.375, 0.375, 0.125)


def _pad(x, axis, lo, hi):
    pads = [(0, 0, 0)] * x.ndim
    pads[axis] = (lo, hi, 0)
    return jax.lax.pad(x, jnp.asarray(0.0, x.dtype), pads)


def _slice(x, axis, start, size, stride=1):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, start + (size - 1) * stride + 1, stride)
    return x[tuple(idx)]


def _filt1d(x, axis, pad_lo, pad_hi, out_len, gain=1.0):
    """4-tap correlation along `axis` with asymmetric zero padding."""
    xp = _pad(x, axis, pad_lo, pad_hi)
    out = None
    for k, f in enumerate(_F):
        term = _slice(xp, axis, k, out_len) * (f * gain)
        out = term if out is None else out + term
    return out


def filter2d(im, gain=1.0, transpose=False):
    """4x4 bilinear filter, stride 1.

    Matches F.conv2d(x, k4x4, padding=1) (H -> H-1) or conv_transpose
    (H -> H+1) from stylegan.py:58-69. `im`: (..., H, W).
    """
    h, w = im.shape[-2], im.shape[-1]
    if transpose:
        out_h, out_w, pad = h + 1, w + 1, 2
    else:
        out_h, out_w, pad = h - 1, w - 1, 1
    x = _filt1d(im, -2, pad, pad, out_h, gain=gain)
    return _filt1d(x, -1, pad, pad, out_w)


def _upsample1d(x, axis):
    """Polyphase 2x upsampling along `axis` with the x2-gain filter.

    out[2i]   = 2 * (f0 * x[i-1] + f2 * x[i])
    out[2i+1] = 2 * (f1 * x[i] + f3 * x[i+1])
    """
    n = x.shape[axis]
    xp = _pad(x, axis, 1, 1)  # x[-1] and x[n] become 0
    even = (_slice(xp, axis, 0, n) * (2 * _F[0]) +
            _slice(xp, axis, 1, n) * (2 * _F[2]))
    odd = (_slice(xp, axis, 1, n) * (2 * _F[1]) +
           _slice(xp, axis, 2, n) * (2 * _F[3]))
    # Interleave even/odd along `axis`.
    stacked = jnp.stack((even, odd), axis=axis + 1 if axis >= 0 else
                        x.ndim + axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


def upsample2d(im):
    """2x bilinear upsampling (conv_transpose k4 s2 p1, kernel * 4);
    matches stylegan.py:72-76. (..., H, W) -> (..., 2H, 2W)."""
    return _upsample1d(_upsample1d(im, -2), -1)


def _downsample1d(x, axis):
    """out[i] = sum_k f[k] xpad[2i + k], xpad padded by 1. H -> H // 2."""
    n = x.shape[axis]
    xp = _pad(x, axis, 1, 1)
    out_len = n // 2
    out = None
    for k, f in enumerate(_F):
        term = _slice(xp, axis, k, out_len, stride=2) * f
        out = term if out is None else out + term
    return out


def downsample2d(im):
    """2x bilinear downsampling (conv k4 s2 p1); matches
    stylegan.py:79-83. (..., H, W) -> (..., H/2, W/2)."""
    return _downsample1d(_downsample1d(im, -2), -1)
