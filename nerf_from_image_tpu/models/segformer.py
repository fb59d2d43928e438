"""SegFormer (MiT-B5) backbone + all-MLP decoder in flax.

Parity with /root/reference/models/segformer.py:24-310: overlap patch
embeddings, efficient attention with spatial-reduction ratios [8, 4, 2, 1],
Mix-FFN with depthwise conv, stochastic depth, depths [3, 6, 40, 3], and
the fused 1/4-resolution decoder. Attention lowers to plain batched
matmuls (MXU); sequence lengths are static per input resolution.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def drop_path(x, rate: float, deterministic: bool, rng=None):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep,
                                (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


def _trunc_normal(std):
    return nn.initializers.truncated_normal(stddev=std / 0.87962566103423978)


class SegDWConv(nn.Module):
    """3x3 depthwise conv over the token grid (segformer.py:40-49)."""
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, height, width):
        b, n, c = x.shape
        x = x.reshape(b, height, width, c)  # NHWC
        x = nn.Conv(self.dim, (3, 3), padding=1, feature_group_count=self.dim,
                    dtype=self.dtype, name='dwconv')(x)
        return x.reshape(b, height * width, c)


class SegMLP(nn.Module):
    """Mix-FFN: fc1 -> dwconv -> gelu -> fc2 (segformer.py:52-68)."""
    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, height, width):
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=_trunc_normal(0.02), name='fc1')(x)
        x = SegDWConv(self.hidden_features, dtype=self.dtype,
                      name='dwconv')(x, height, width)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_features, dtype=self.dtype,
                     kernel_init=_trunc_normal(0.02), name='fc2')(x)
        return x


class SegAttention(nn.Module):
    """Efficient attention with spatial reduction (segformer.py:71-111)."""
    dim: int
    num_heads: int = 8
    sr_ratio: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, height, width):
        b, n, c = x.shape
        hd = c // self.num_heads
        scale = 1.0 / math.sqrt(hd)

        q = nn.Dense(self.dim, dtype=self.dtype,
                     kernel_init=_trunc_normal(0.02), name='q')(x)
        q = q.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        kv_in = x
        if self.sr_ratio > 1:
            xs = x.reshape(b, height, width, c)
            xs = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio),
                         dtype=self.dtype, name='sr')(xs)
            xs = xs.reshape(b, -1, c)
            kv_in = nn.LayerNorm(dtype=self.dtype, name='norm')(xs)
        kv = nn.Dense(self.dim * 2, dtype=self.dtype,
                      kernel_init=_trunc_normal(0.02), name='kv')(kv_in)
        m = kv.shape[1]
        kv = kv.reshape(b, m, 2, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        prec = (jax.lax.Precision.HIGHEST
                if self.dtype == jnp.float32 else None)
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k, precision=prec,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v, precision=prec,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype,
                        kernel_init=_trunc_normal(0.02), name='proj')(out)


class SegBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    drop_path_rate: float = 0.0
    sr_ratio: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, height, width, deterministic=True):
        # Two INDEPENDENT stochastic-depth draws per block: the reference's
        # SegBlock calls its SegDropPath once per residual (segformer.py:
        # 120-126), and each call draws a fresh bernoulli mask. make_rng
        # folds in a per-call counter, so each call yields a fresh key.
        live = not deterministic and self.drop_path_rate > 0
        y = SegAttention(self.dim, self.num_heads, self.sr_ratio,
                         dtype=self.dtype, name='attn')(
                             nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                          name='norm1')(x), height, width)
        x = x + drop_path(y, self.drop_path_rate, deterministic,
                          self.make_rng('droppath') if live else None)
        y = SegMLP(self.dim * self.mlp_ratio, self.dim, dtype=self.dtype,
                   name='mlp')(
                       nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                    name='norm2')(x), height, width)
        x = x + drop_path(y, self.drop_path_rate, deterministic,
                          self.make_rng('droppath') if live else None)
        return x


class SegOverlapPatchEmbed(nn.Module):
    patch_size: int
    stride: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> (tokens (B, N, D), h, w)."""
        pad = self.patch_size // 2
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                    name='proj')(x)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(x.shape[0], h * w, self.embed_dim)
        return nn.LayerNorm(dtype=self.dtype, name='norm')(x), h, w


def _bilinear_resize(x, out_h, out_w):
    """F.interpolate(mode='bilinear', align_corners=False), NHWC."""
    return jax.image.resize(x, (x.shape[0], out_h, out_w, x.shape[-1]),
                            method='bilinear')


class Segformer(nn.Module):
    """MiT-B5 + all-MLP decode head (segformer.py:175-275). NCHW in/out to
    match the reference contract."""
    out_features: int = 512
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    drop_path_rate: float = 0.1
    depths: Sequence[int] = (3, 6, 40, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    decoder_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = x.transpose(0, 2, 3, 1).astype(self.dtype)  # -> NHWC
        b = x.shape[0]
        total_depth = sum(self.depths)
        dpr = [
            self.drop_path_rate * i / max(total_depth - 1, 1)
            for i in range(total_depth)
        ]
        features = []
        cur = 0
        for i in range(4):
            tokens, h, w = SegOverlapPatchEmbed(
                patch_size=7 if i == 0 else 3,
                stride=4 if i == 0 else 2,
                embed_dim=self.embed_dims[i], dtype=self.dtype,
                name=f'patch_embed{i + 1}')(x)
            for j in range(self.depths[i]):
                tokens = SegBlock(self.embed_dims[i], self.num_heads[i],
                                  self.mlp_ratios[i], dpr[cur + j],
                                  self.sr_ratios[i], dtype=self.dtype,
                                  name=f'block{i + 1}_{j}')(
                                      tokens, h, w, deterministic)
            tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                  name=f'norm{i + 1}')(tokens)
            x = tokens.reshape(b, h, w, self.embed_dims[i])
            features.append(x)
            cur += self.depths[i]

        out_h, out_w = features[0].shape[1], features[0].shape[2]
        all_c = []
        for i in reversed(range(4)):
            c = nn.Dense(self.decoder_dim, dtype=self.dtype,
                         kernel_init=_trunc_normal(0.02),
                         name=f'linear_c{i + 1}')(features[i])
            if i > 0:
                c = _bilinear_resize(c, out_h, out_w)
            all_c.append(c)
        fused = nn.Conv(self.decoder_dim, (1, 1), dtype=self.dtype,
                        name='linear_fuse')(
                            jnp.concatenate(all_c, axis=-1))
        pred = nn.Conv(self.out_features, (1, 1), dtype=self.dtype,
                       name='linear_pred')(fused)
        return pred.transpose(0, 3, 1, 2).astype(jnp.float32)  # -> NCHW
