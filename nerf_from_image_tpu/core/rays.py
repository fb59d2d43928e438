"""Ray generation and near/far plane computation (pure JAX, static shapes).

Behavioral parity with the reference ray model
(/root/reference/lib/nerf_utils.py:28-120, 225-273): perspective and
orthographic cameras, optional principal-point offset ("center") and
normalized-bbox crop, AABB slab intersection for per-ray near/far, and
stratified depth sampling.  All functions are shape-static and
differentiable; randomness comes from explicit `jax.random` keys.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_ray_bundle(
    height: int,
    width: int,
    focal_length: Optional[jnp.ndarray],
    cam2world: jnp.ndarray,
    bbox: Optional[jnp.ndarray] = None,
    center: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generates per-pixel ray origins/directions in world space.

    Args:
      height, width: image resolution (static).
      focal_length: (B,) normalized focal length, or None for an
        orthographic camera.
      cam2world: (B, 4, 4) camera-to-world matrices. For the ortho model the
        [3, 3] entry carries a global scale.
      bbox: optional (B, 2, 2) normalized crop [[x0, y0], [w, h]].
      center: optional (B, 2) principal point in [0, 1] (perspective only).

    Returns:
      ray_origins, ray_directions: (B, H, W, 3) each. Directions are NOT
      normalized (matches reference; callers normalize).
    """
    dtype = cam2world.dtype
    b = cam2world.shape[0]
    # Pixel grids: ii[r, c] = c / W, jj[r, c] = r / H.
    ii = jnp.broadcast_to(
        (jnp.arange(width, dtype=dtype) / width)[None, :], (height, width))
    jj = jnp.broadcast_to(
        (jnp.arange(height, dtype=dtype) / height)[:, None], (height, width))

    rot = cam2world[:, :3, :3]  # (B, 3, 3)
    t = cam2world[:, :3, 3]  # (B, 3)

    if focal_length is not None:
        # Perspective projection model.
        ii = ii[None]
        jj = jj[None]
        if center is not None:
            ii = ii - 0.5 * (2.0 * center[:, 0, None, None] - 1.0) - 0.5
            jj = jj - 0.5 * (2.0 * center[:, 1, None, None] - 1.0) - 0.5
        else:
            ii = ii - 0.5
            jj = jj - 0.5

        if bbox is not None:
            ii = (bbox[:, 1:2, 0, None] * (ii + 0.5) +
                  bbox[:, 0:1, 0, None]) * 0.5
            jj = -(bbox[:, 1:2, 1, None] * (-jj + 0.5) +
                   bbox[:, 0:1, 1, None]) * 0.5

        ii = ii / focal_length[:, None, None]
        jj = jj / focal_length[:, None, None]

        directions = jnp.stack((ii, -jj, -jnp.ones_like(ii)), axis=-1)
        # world_dir = R @ cam_dir.
        ray_directions = jnp.einsum('bij,bhwj->bhwi', rot, directions,
                                      precision=jax.lax.Precision.HIGHEST)
        ray_origins = jnp.broadcast_to(t[:, None, None, :],
                                       ray_directions.shape)
    else:
        # Orthographic projection model; scale lives in cam2world[3, 3].
        ii = (ii[None] - 0.5) * 2.0
        jj = (jj[None] - 0.5) * 2.0
        ii = jnp.broadcast_to(ii, (b, height, width))
        jj = jnp.broadcast_to(jj, (b, height, width))

        if bbox is not None:
            ii = (bbox[:, 1:2, 0, None] * (ii / 2.0 + 0.5) +
                  bbox[:, 0:1, 0, None])
            jj = -(bbox[:, 1:2, 1, None] * (-jj / 2.0 + 0.5) +
                   bbox[:, 0:1, 1, None])

        origins_local = jnp.stack((ii, -jj, jnp.zeros_like(ii)), axis=-1)
        dirs_local = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, -1.0], dtype=dtype),
            origins_local.shape)

        ray_origins = (jnp.einsum('bij,bhwj->bhwi', rot, origins_local,
                                  precision=jax.lax.Precision.HIGHEST) +
                       t[:, None, None, :])
        ray_directions = (jnp.einsum('bij,bhwj->bhwi', rot, dirs_local,
                                   precision=jax.lax.Precision.HIGHEST) /
                          cam2world[:, None, None, 3, 3, None])

    return ray_origins, ray_directions


def compute_near_far_planes(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    scene_range: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray near/far via slab intersection with the [-r, r]^3 AABB.

    Rays that miss the box are assigned the global (batch-wide) min near /
    max far over the hitting rays (reference semantics:
    lib/nerf_utils.py:248-259). Results are clamped to >= 0.1 and
    far >= near + 1e-3. Non-differentiable by design (applied under
    stop_gradient upstream).
    """
    shape = ray_origins.shape[:-1]
    o = lax_stop(ray_origins).reshape(-1, 3)
    d = lax_stop(ray_directions).reshape(-1, 3)

    invdir = 1.0 / d
    t_lo = (-scene_range - o) * invdir
    t_hi = (scene_range - o) * invdir
    tmin = jnp.minimum(t_lo, t_hi)  # per-axis entry
    tmax = jnp.maximum(t_lo, t_hi)  # per-axis exit

    xmin, ymin, zmin = tmin[:, 0], tmin[:, 1], tmin[:, 2]
    xmax, ymax, zmax = tmax[:, 0], tmax[:, 1], tmax[:, 2]

    mask = jnp.ones(o.shape[0], dtype=bool)
    mask = mask & ~((xmin > ymax) | (ymin > xmax))
    near = jnp.maximum(xmin, ymin)
    far = jnp.minimum(xmax, ymax)
    mask = mask & ~((near > zmax) | (zmin > far))
    near = jnp.maximum(near, zmin)
    far = jnp.minimum(far, zmax)

    # Fill misses with the masked global min/max.
    big = jnp.asarray(jnp.inf, near.dtype)
    near_fill = jnp.min(jnp.where(mask, near, big))
    far_fill = jnp.max(jnp.where(mask, far, -big))
    near = jnp.where(mask, near, near_fill)
    far = jnp.where(mask, far, far_fill)

    near = jnp.maximum(near, 0.1)
    far = jnp.maximum(far, 0.1)
    eps = 1e-3
    far = jnp.where(far - near < eps, near + eps, far)

    return near.reshape(shape), far.reshape(shape)


def compute_query_points_from_rays(
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    num_samples: int,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified depth sampling along rays.

    depth_i = lerp(near, far, i / N) (+ U[0,1) * (far-near)/N if `rng`).
    `rng` may also be a precomputed float array of uniform noise with
    depth_values' shape (trajectory-parity injection: the reference's
    torch.rand_like draw, nerf_utils.py:113-115, recorded and replayed).
    Returns (query_points (..., N, 3), depth_values (..., N)).
    """
    near_plane = near[..., None]
    far_plane = far[..., None]
    frac = jnp.arange(num_samples, dtype=ray_origins.dtype) / num_samples
    depth_values = near_plane + (far_plane - near_plane) * frac

    if rng is not None:
        delta = (far_plane - near_plane) / num_samples
        if jnp.issubdtype(rng.dtype, jnp.floating):
            u = rng.reshape(depth_values.shape).astype(depth_values.dtype)
        else:
            # Drawn FLAT, then reshaped: when XLA rematerializes the
            # jittered depths in the backward pass it keeps the threefry
            # bit tensors alive, and in (B, H, W, S)-shaped form those
            # pick up 8x T(8,128) padding (10 x 512 MB at the batch-16
            # training point); the flat u32 vectors are pad-free.
            n = int(np.prod(depth_values.shape))
            u = jax.random.uniform(rng, (n,),
                                   dtype=depth_values.dtype).reshape(
                                       depth_values.shape)
        depth_values = depth_values + u * delta

    query_points = (ray_origins[..., None, :] +
                    ray_directions[..., None, :] * depth_values[..., :, None])
    return query_points, depth_values


def lax_stop(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.stop_gradient(x)
