"""InceptionV3 (FID variant, TF-ported weights) in flax.

Parity with the network used by /root/reference/lib/fid.py:22-38
(pytorch-fid's `InceptionV3` with `use_fid_inception=True`): the
torchvision InceptionV3 topology with the FID-specific tweaks — average
pooling excludes padding in the A/C/E blocks, and the last E block
(Mixed_7c) uses a max pool in its pool branch. Input: (B, 3, H, W) in
[0, 1]; resized to 299x299 bilinear and scaled to [-1, 1] like
pytorch-fid. Output: (B, 2048) pooled activations.

Weights must be converted from the TF-FID checkpoint
(utils/torch_convert.py::convert_inception); random init is only for
shape-checking.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _avg_pool_no_pad(x, window=3):
    """3x3 stride-1 average pool, padding 1, count_include_pad=False. NHWC."""
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    sum_x = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                  (1, window, window, 1), (1, 1, 1, 1),
                                  [(0, 0), (1, 1), (1, 1), (0, 0)])
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                                (1, window, window, 1), (1, 1, 1, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
    return sum_x / cnt


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class BasicConv2d(nn.Module):
    """conv(no bias) + batchnorm(eps=1e-3, inference) + relu. NHWC."""
    out_channels: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.out_channels, self.kernel,
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        # Inference-mode batch norm with stored statistics.
        scale = self.param('bn_scale', nn.initializers.ones,
                           (self.out_channels,))
        bias = self.param('bn_bias', nn.initializers.zeros,
                          (self.out_channels,))
        mean = self.variable('batch_stats', 'mean',
                             nn.initializers.zeros, None,
                             (self.out_channels,))
        var = self.variable('batch_stats', 'var', nn.initializers.ones, None,
                            (self.out_channels,))
        inv = jax.lax.rsqrt(var.value + 1e-3) * scale
        x = x * inv.astype(x.dtype) + (bias - mean.value * inv).astype(x.dtype)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name='branch1x1')(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name='branch5x5_1')(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=self.dtype,
                         name='branch5x5_2')(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype,
                         name='branch3x3dbl_1')(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name='branch3x3dbl_2')(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name='branch3x3dbl_3')(b3)
        bp = _avg_pool_no_pad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype,
                         name='branch_pool')(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, dtype=self.dtype,
                         name='branch3x3')(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype,
                         name='branch3x3dbl_1')(x)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name='branch3x3dbl_2')(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, dtype=self.dtype,
                         name='branch3x3dbl_3')(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name='branch1x1')(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name='branch7x7_1')(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name='branch7x7_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name='branch7x7_3')(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype,
                         name='branch7x7dbl_1')(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name='branch7x7dbl_2')(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name='branch7x7dbl_3')(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name='branch7x7dbl_4')(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name='branch7x7dbl_5')(bd)
        bp = _avg_pool_no_pad(x)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name='branch_pool')(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name='branch3x3_1')(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, dtype=self.dtype,
                         name='branch3x3_2')(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name='branch7x7x3_1')(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name='branch7x7x3_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name='branch7x7x3_3')(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, dtype=self.dtype,
                         name='branch7x7x3_4')(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = 'avg'  # 'avg' (Mixed_7b) or 'max' (FID Mixed_7c)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name='branch1x1')(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name='branch3x3_1')(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype,
                          name='branch3x3_2a')(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype,
                          name='branch3x3_2b')(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype,
                         name='branch3x3dbl_1')(x)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=self.dtype,
                         name='branch3x3dbl_2')(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype,
                          name='branch3x3dbl_3a')(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype,
                          name='branch3x3dbl_3b')(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == 'avg':
            bp = _avg_pool_no_pad(x)
        else:
            bp = _max_pool(x, 3, 1, pad=1)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name='branch_pool')(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Pool3 (2048-D) activations for FID. Input (B, 3, H, W) in [0, 1]."""
    resize_input: bool = True
    normalize_input: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.transpose(0, 2, 3, 1).astype(self.dtype)  # NHWC
        if self.resize_input:
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]),
                                 method='bilinear')
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, dtype=self.dtype,
                        name='Conv2d_1a_3x3')(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name='Conv2d_2a_3x3')(x)
        x = BasicConv2d(64, (3, 3), padding=1, dtype=self.dtype,
                        name='Conv2d_2b_3x3')(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name='Conv2d_3b_1x1')(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name='Conv2d_4a_3x3')(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, dtype=self.dtype, name='Mixed_5b')(x)
        x = InceptionA(64, dtype=self.dtype, name='Mixed_5c')(x)
        x = InceptionA(64, dtype=self.dtype, name='Mixed_5d')(x)
        x = InceptionB(dtype=self.dtype, name='Mixed_6a')(x)
        x = InceptionC(128, dtype=self.dtype, name='Mixed_6b')(x)
        x = InceptionC(160, dtype=self.dtype, name='Mixed_6c')(x)
        x = InceptionC(160, dtype=self.dtype, name='Mixed_6d')(x)
        x = InceptionC(192, dtype=self.dtype, name='Mixed_6e')(x)
        x = InceptionD(dtype=self.dtype, name='Mixed_7a')(x)
        x = InceptionE('avg', dtype=self.dtype, name='Mixed_7b')(x)
        x = InceptionE('max', dtype=self.dtype, name='Mixed_7c')(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (B, 2048)
