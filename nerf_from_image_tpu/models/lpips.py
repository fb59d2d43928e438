"""LPIPS perceptual loss with a VGG16 backbone, in flax.

Parity with /root/reference/lib/metrics.py:97-137 (which wraps the `lpips`
package): scaling layer -> VGG16 conv features at relu{1_2,2_2,3_3,4_3,5_3}
-> unit-normalize -> squared diff -> learned non-negative 1x1 weights ->
spatial mean -> sum over layers. Supports feature caching (pass
precomputed features as `in1`). Weights are converted from the reference
torch checkpoints via utils/torch_convert.py; random init is only for
shape-checking.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# VGG16 feature config (torchvision): conv channels per block.
_VGG_BLOCKS = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
               (512, 512, 512))

# ImageNet scaling used by LPIPS (inputs in [-1, 1]).
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])


class VGG16Features(nn.Module):
    """VGG16 conv tower returning the 5 LPIPS feature maps. NCHW in."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.transpose(0, 2, 3, 1).astype(self.dtype)  # -> NHWC
        feats = []
        conv_idx = 0
        for b, widths in enumerate(_VGG_BLOCKS):
            for w in widths:
                x = nn.Conv(w, (3, 3), padding=1, dtype=self.dtype,
                            name=f'conv{conv_idx}')(x)
                x = nn.relu(x)
                conv_idx += 1
            feats.append(x.transpose(0, 3, 1, 2))  # NCHW out
            if b < len(_VGG_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return tuple(feats)


def normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Full LPIPS distance. Inputs in [-1, 1] (or [0, 1] with
    normalize=True), NCHW."""
    dtype: Dtype = jnp.float32

    def setup(self):
        self.net = VGG16Features(dtype=self.dtype)
        # Per-layer non-negative 1x1 "lin" weights.
        chans = (64, 128, 256, 512, 512)
        self.lins = [
            nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    name=f'lin{i}') for i in range(len(chans))
        ]

    def features(self, im):
        """Scaled VGG features, unit-normalized per layer (for caching)."""
        im = (im - _SHIFT.reshape(1, 3, 1, 1)) / _SCALE.reshape(1, 3, 1, 1)
        feats = self.net(im)
        return tuple(normalize_tensor(f) for f in feats)

    def __call__(self, in0, in1=None, normalize: bool = False,
                 reduction: str = 'none'):
        if normalize:
            in0 = 2.0 * in0 - 1.0
            if in1 is not None and not isinstance(in1, tuple):
                in1 = 2.0 * in1 - 1.0

        f0 = self.features(in0)
        if in1 is None:
            return f0
        f1 = in1 if isinstance(in1, tuple) else self.features(in1)

        total = 0.0
        for i, (x, y) in enumerate(zip(f0, f1)):
            d = jnp.square(x - y).transpose(0, 2, 3, 1)  # NHWC for conv
            v = self.lins[i](d)  # (B, H, W, 1)
            total = total + jnp.mean(v, axis=(1, 2))  # (B, 1)
        if reduction == 'mean':
            return jnp.mean(total)
        return total
