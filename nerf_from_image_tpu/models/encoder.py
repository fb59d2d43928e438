"""Bootstrap encoder: SegFormer -> (canonical coords, mask, latent w).

Parity with /root/reference/models/encoder.py:21-103: a 4x-upsampled
conv head regresses 3-channel canonical coordinates + sigmoid mask, and a
pooled head regresses the StyleGAN latent w. `separate_backbones` uses an
independent SegFormer for the latent head.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_from_image_tpu.models.segformer import Segformer, _bilinear_resize

Dtype = Any


class BootstrapEncoder(nn.Module):
    latent_dim: int
    pose_regressor: bool = True
    latent_regressor: bool = True
    separate_backbones: bool = False
    dtype: Dtype = jnp.float32
    # Backbone size (default: MiT-B5, the reference's init_segformer).
    # Overridable so tests can exercise the full distillation pipeline
    # with a tiny backbone.
    depths: Tuple[int, ...] = (3, 6, 40, 3)
    embed_dims: Tuple[int, ...] = (64, 128, 320, 512)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    drop_path_rate: float = 0.1
    head_width: int = 512

    def _backbone(self, name):
        return Segformer(out_features=self.head_width, dtype=self.dtype,
                         depths=self.depths, embed_dims=self.embed_dims,
                         num_heads=self.num_heads,
                         sr_ratios=self.sr_ratios,
                         drop_path_rate=self.drop_path_rate,
                         decoder_dim=768 if self.head_width == 512
                         else 2 * self.head_width,
                         name=name)

    @nn.compact
    def __call__(self, x, deterministic=True):
        """x: (B, 3, H, W) in [-1, 1]. Returns (coords (B,H,W,3),
        mask (B,H,W), w (B,1,latent_dim)); None for disabled heads."""
        features = self._backbone('backbone')(x, deterministic)

        coords = segmentation = w = None
        if self.pose_regressor:
            f = features.transpose(0, 2, 3, 1)  # NHWC
            f = _bilinear_resize(f, f.shape[1] * 4, f.shape[2] * 4)
            f = nn.relu(f)
            f = nn.relu(nn.Conv(self.head_width, (3, 3), padding=1,
                                dtype=self.dtype, name='post0')(f))
            f = nn.relu(nn.Conv(self.head_width, (3, 3), padding=1,
                                dtype=self.dtype, name='post1')(f))
            maps = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                           name='post2')(f)
            coords = maps[..., :3].astype(jnp.float32)
            segmentation = jax.nn.sigmoid(maps[..., 3]).astype(jnp.float32)

        if self.latent_regressor:
            if self.separate_backbones:
                features_latent = self._backbone('backbone_latent')(
                    x, deterministic)
            else:
                features_latent = features
            fl = nn.relu(features_latent.transpose(0, 2, 3, 1))
            fl = nn.relu(nn.Conv(self.head_width, (3, 3), padding=1,
                                 dtype=self.dtype, name='w_pre')(fl))
            fl = jnp.mean(fl, axis=(1, 2))
            fl = nn.relu(nn.Dense(self.head_width, dtype=self.dtype,
                                  name='w_post0')(fl))
            fl = nn.Dense(self.latent_dim, dtype=self.dtype,
                          name='w_post1')(fl)
            w = nn.leaky_relu(fl, 0.2)[:, None, :].astype(jnp.float32)

        return coords, segmentation, w
