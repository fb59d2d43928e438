"""Alpha compositing of per-ray density/feature samples (pure JAX).

Parity with /root/reference/lib/nerf_utils.py:20-26, 123-180 (exclusive
cumprod transmittance, white-background compositing, detached depth/normal
weights). The sample axis is the last axis; everything is a fixed-length
associative scan (sorted inputs) or a pairwise-comparison reduction
(unsorted merged coarse+fine inputs, compute_weights_unsorted) that XLA
fuses onto the VPU — no sort or gather anywhere. The triplane feature
lookup feeding this has a windowed Pallas kernel in
ops/pallas/triplane_window.py.
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
    samples_sorted: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray],
           Optional[jnp.ndarray]]:
    """Composites sigma/rgb (and optional normals/semantics) along rays.

    Args:
      sigma: (..., S), rgb: (..., S, C), depth_values: (..., S),
      ray_directions: (..., 3).
      samples_sorted: True -> depth_values are ascending per ray (single
        stratified pass) and weights use the exclusive-cumprod scan;
        False -> arbitrary order (merged coarse+fine), weights use the
        pairwise-comparison formulation (compute_weights_unsorted). All
        composited outputs are order-invariant sums, so no sort/gather is
        needed either way.

    Returns:
      (rgb_map (..., C), depth_map (...), mask (...), normal_map, semantic_map)
      Depth and normal maps use detached weights (reference semantics).
    """
    if samples_sorted:
        weights = compute_weights(sigma, ray_directions, depth_values)
    else:
        weights = compute_weights_unsorted(sigma, ray_directions,
                                           depth_values)

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


def compute_weights_unsorted(
    sigma: jnp.ndarray,
    ray_directions: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> jnp.ndarray:
    """Volume-rendering weights for UNSORTED per-ray samples.

    TPU-native replacement for the reference's fine-pass sort-merge
    (/root/reference/run.py:259-335): every composited output is an
    order-invariant sum sum_i(w_i * v_i), so instead of sorting the merged
    coarse+fine samples and gathering values (XLA sort + gather ran at
    ~950 ms/step), the weights are computed directly in the given order
    from pairwise depth comparisons:

      d_i   = min{ z_j : z_j after z_i } - z_i          (successor dist)
      T_i   = prod_{j before i} (1 - alpha_j + 1e-10)
            = exp( sum_{j before i} log(exp(-sigma_j d_j) + 1e-10) )
      w_i   = (1 - exp(-sigma_i d_i)) * T_i

    with "before" = (z_j < z_i) or (z_j == z_i and j < i) — a stable
    ordering so exact depth ties (possible in bf16) stay deterministic.
    The (S, S) comparison grids are fused compare+select+reduce loops on
    the VPU; nothing is ever gathered or sorted. Equals the sorted-space
    computation exactly (up to exp/log round-off ~1e-6).

    Args:
      sigma: (..., S), depth_values: (..., S) (any per-ray order),
      ray_directions: (..., 3).

    Returns:
      weights (..., S), aligned with the INPUT sample order.
    """
    z = depth_values.astype(jnp.float32)
    s = z.shape[-1]
    zi = z[..., :, None]  # (..., S, 1) "self"
    zj = z[..., None, :]  # (..., 1, S) "other"
    idx = jnp.arange(s, dtype=jnp.int32)
    tie = zj == zi
    before = (zj < zi) | (tie & (idx[..., None, :] < idx[..., :, None]))
    after = (zj > zi) | (tie & (idx[..., None, :] > idx[..., :, None]))

    # Successor distance (0 for the per-ray maximum, matching the sorted
    # formulation's trailing zero dist).
    succ = jnp.min(jnp.where(after, zj, jnp.float32(jnp.inf)), axis=-1)
    dists = jnp.where(jnp.isfinite(succ), succ - z, 0.0)
    dists = dists * jnp.linalg.norm(
        ray_directions.astype(jnp.float32), axis=-1, keepdims=True)

    sd = sigma.astype(jnp.float32) * dists
    alpha = 1.0 - jnp.exp(-sd)
    log_trans = jnp.log(jnp.exp(-sd) + 1e-10)  # log(1 - alpha + 1e-10)
    acc = jnp.sum(jnp.where(before, log_trans[..., None, :], 0.0), axis=-1)
    weights = alpha * jnp.exp(acc)
    return weights.astype(sigma.dtype)
