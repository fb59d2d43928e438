"""Pose-conditioned StyleGAN2 discriminator (flax).

Parity with /root/reference/models/discriminator.py:21-80: conditioning is
the 13-D pose vector (log f, t2, s, flattened R), optionally concatenated
with an image embedding (encoder mode) or a class embedding.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from nerf_from_image_tpu.core import pose as pose_utils
from nerf_from_image_tpu.models import generator as generator_lib
from nerf_from_image_tpu.models import stylegan

Dtype = Any


class Discriminator(nn.Module):
    resolution: int
    nc: int
    camera_flipped: bool
    conditional_pose: bool = True
    use_encoder: bool = False
    num_classes: Optional[int] = None
    channel_base: int = 32768
    channel_max: int = 512
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.use_encoder:
            self.emb = generator_lib.ResidualEncoder(dtype=self.dtype)
        if self.num_classes:
            self.label_embedding = nn.Embed(self.num_classes, 512)
        c_dim = 0
        if self.conditional_pose:
            c_dim += 13
        if self.use_encoder:
            c_dim += 512
        if self.num_classes:
            c_dim += 512
        self.backbone = stylegan.DiscriminatorBackbone(
            c_dim=c_dim, img_resolution=self.resolution,
            img_channels=self.nc, channel_base=self.channel_base,
            channel_max=self.channel_max, dtype=self.dtype)

    def __call__(self, x, pose=None, image=None, focal=None):
        """x: (B, nc, H, W); pose: (B, 4, 4) cam2world; focal: (B,) or None."""
        cond_parts = []
        if self.num_classes:
            cond_parts.append(self.label_embedding(image))
        elif self.use_encoder:
            cond_parts.append(self.emb(image))
        if self.conditional_pose:
            cond_parts.append(
                pose_utils.matrix_to_conditioning_vector(
                    pose, focal, self.camera_flipped).astype(self.dtype))
        cond = jnp.concatenate(cond_parts, axis=-1) if cond_parts else None
        return self.backbone(x, cond)
