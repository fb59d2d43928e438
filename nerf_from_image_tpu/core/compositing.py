"""Alpha compositing of per-ray density/feature samples (pure JAX).

Parity with /root/reference/lib/nerf_utils.py:20-26, 123-180 (exclusive
cumprod transmittance, white-background compositing, detached depth/normal
weights). The sample axis is the last axis; everything is a fixed-length
associative scan that XLA maps well to the VPU. A fused Pallas variant
lives in ops/pallas/composite.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cumprod_exclusive(x: jnp.ndarray) -> jnp.ndarray:
    """tf.math.cumprod(..., exclusive=True) along the last axis."""
    cp = jnp.cumprod(x[..., :-1], axis=-1)
    return jnp.concatenate((jnp.ones_like(cp[..., :1]), cp), axis=-1)


def compute_weights(
    sigma: jnp.ndarray,
    ray_directions: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> jnp.ndarray:
    """Volume-rendering weights w_i = alpha_i * T_i along the sample axis.

    dists_i = depth_{i+1} - depth_i (0 for the last sample), scaled by the
    ray direction norm; alpha = 1 - exp(-sigma * dist).
    """
    dists = jnp.concatenate(
        (depth_values[..., 1:] - depth_values[..., :-1],
         jnp.zeros_like(depth_values[..., :1])),
        axis=-1)
    dists = dists * jnp.linalg.norm(ray_directions, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-sigma * dists)
    return alpha * cumprod_exclusive(1.0 - alpha + 1e-10)


def render_volume_density(
    sigma: jnp.ndarray,
    rgb: jnp.ndarray,
    ray_directions: jnp.ndarray,
    depth_values: jnp.ndarray,
    normals: Optional[jnp.ndarray] = None,
    semantics: Optional[jnp.ndarray] = None,
    white_background: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray],
           Optional[jnp.ndarray]]:
    """Composites sigma/rgb (and optional normals/semantics) along rays.

    Args:
      sigma: (..., S), rgb: (..., S, C), depth_values: (..., S),
      ray_directions: (..., 3).

    Returns:
      (rgb_map (..., C), depth_map (...), mask (...), normal_map, semantic_map)
      Depth and normal maps use detached weights (reference semantics).
    """
    weights = compute_weights(sigma, ray_directions, depth_values)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    weights_sg = jax.lax.stop_gradient(weights)
    depth_map = jnp.sum(weights_sg * jax.lax.stop_gradient(depth_values),
                        axis=-1)
    normal_map = (jnp.sum(weights_sg[..., None] * normals, axis=-2)
                  if normals is not None else None)
    semantic_map = (jnp.sum(weights[..., None] * semantics, axis=-2)
                    if semantics is not None else None)
    mask = jnp.sum(weights, axis=-1)

    if white_background:
        rgb_map = rgb_map + (1.0 - mask[..., None])
        if normal_map is not None:
            normal_map = normal_map + (1.0 - mask[..., None])

    return rgb_map, depth_map, mask, normal_map, semantic_map


def render_volume_density_weights_only(
    sigma: jnp.ndarray,
    ray_directions: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> jnp.ndarray:
    return compute_weights(sigma, ray_directions, depth_values)
