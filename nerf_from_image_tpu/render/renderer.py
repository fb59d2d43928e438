"""Volume renderer: rays -> coarse/fine field sampling -> compositing.

Functional re-design of the reference `render()` pipeline
(/root/reference/run.py:176-350) as one jittable function. The field is
abstracted as `sample_fn(points, requests) -> dict` (the functional
equivalent of the reference's sampler closure); coarse and fine passes,
EG3D weight smoothing, PDF resampling, and the sorted merge are all
static-shape and differentiate end-to-end (camera gradients included).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from nerf_from_image_tpu.core import compositing
from nerf_from_image_tpu.core import rays as rays_lib
from nerf_from_image_tpu.core import sampling


@flax.struct.dataclass
class RenderOutput:
    rgb: jnp.ndarray  # (B, H, W, C)
    depth: jnp.ndarray  # (B, H, W)
    mask: jnp.ndarray  # (B, H, W)
    normals: Optional[jnp.ndarray] = None  # (B, H, W, 3)
    semantics: Optional[jnp.ndarray] = None  # (B, H, W, K or 3)
    # Windowed-sampler overflow residual summed over the coarse+fine
    # passes (scalar int32). 0 (or None on the XLA sampling path) means
    # the render is exact; >0 means some points exceeded the fixed
    # correction capacity (models/generator.py overflow_capacity_frac).
    overflow_resid: Optional[jnp.ndarray] = None


def normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def render(
    sample_fn: Callable[[jnp.ndarray, Sequence[str]], Dict[str, jnp.ndarray]],
    height: int,
    width: int,
    cam2world: jnp.ndarray,
    focal_length: Optional[jnp.ndarray],
    center: Optional[jnp.ndarray],
    bbox: Optional[jnp.ndarray],
    scene_range: float,
    white_background: bool,
    depth_samples_per_ray: int,
    rng: Optional[jax.Array] = None,
    fine_sampling: bool = True,
    compute_normals: bool = False,
    compute_semantics: bool = False,
    compute_coords: bool = False,
    force_no_cam_grad: bool = False,
    ray_sharding=None,
) -> RenderOutput:
    """Renders a batch of views. `rng=None` -> deterministic sampling.

    `rng` may also be a dict of precomputed noise arrays
    {'depth': uniform (B, H, W, S), 'pdf_u': uniform (B*H*W, S)} —
    trajectory-parity injection of the reference's per-render torch.rand
    draws (nerf_utils.py:113-115, 202-204).

    `ray_sharding`: optional NamedSharding for the (B, H, W, 3) ray
    tensors (e.g. parallel.ray_spec(mesh) with a 'rays' mesh axis).
    Rays are embarrassingly parallel (SURVEY §5): annotating them here
    makes GSPMD shard the whole per-ray compute — sampling, field
    evaluation, compositing — across devices, with only the output
    gather as communication. Use for large single-image eval/demo
    renders where the batch axis alone cannot fill the mesh.
    """
    b = cam2world.shape[0]
    ray_origins, ray_directions = rays_lib.get_ray_bundle(
        height, width, focal_length, cam2world, bbox, center)
    ray_directions = normalize(ray_directions)
    if ray_sharding is not None:
        ray_origins = jax.lax.with_sharding_constraint(ray_origins,
                                                       ray_sharding)
        ray_directions = jax.lax.with_sharding_constraint(ray_directions,
                                                          ray_sharding)

    near, far = rays_lib.compute_near_far_planes(
        jax.lax.stop_gradient(ray_origins),
        jax.lax.stop_gradient(ray_directions), scene_range)

    rng_coarse = rng_fine = None
    if isinstance(rng, dict):
        rng_coarse = rng.get('depth')
        rng_fine = rng.get('pdf_u')
    elif rng is not None:
        rng_coarse, rng_fine = jax.random.split(rng)

    query_points, depth_values = rays_lib.compute_query_points_from_rays(
        ray_origins, ray_directions, near, far, depth_samples_per_ray,
        rng=rng_coarse)

    if force_no_cam_grad:
        query_points = jax.lax.stop_gradient(query_points)
        depth_values = jax.lax.stop_gradient(depth_values)
        ray_directions = jax.lax.stop_gradient(ray_directions)

    requests = ['sigma', 'rgb']
    if compute_normals:
        requests.append('normals')
    if compute_semantics:
        requests.append('semantics')
    if compute_coords:
        requests.append('coords')

    def unflatten(v, s):
        return v.reshape(b, height, width, s, -1)

    s_coarse = depth_samples_per_ray
    out_coarse = sample_fn(query_points, tuple(requests))
    sigma = unflatten(out_coarse['sigma'], s_coarse)[..., 0]
    rgb = unflatten(out_coarse['rgb'], s_coarse)
    normals = (unflatten(out_coarse['normals'], s_coarse)
               if compute_normals else None)
    semantics = (unflatten(out_coarse['semantics'], s_coarse)
                 if compute_semantics else None)
    coords = (unflatten(out_coarse['coords'], s_coarse)
              if compute_coords else None)
    overflow_resid = out_coarse.get('overflow_resid')

    if fine_sampling:
        z_vals = depth_values
        weights = jax.lax.stop_gradient(
            compositing.render_volume_density_weights_only(
                sigma, ray_directions, depth_values))
        weights = sampling.smooth_weights_eg3d(
            weights.reshape(-1, s_coarse))
        z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sampling.sample_pdf(
            z_vals_mid.reshape(-1, s_coarse - 1),
            weights[..., 1:-1],
            depth_samples_per_ray,
            rng=rng_fine)
        # Values-only per-ray ascending sort. The COMPOSITE doesn't need
        # it (the pairwise-weights formulation is sample-order-invariant,
        # so every scalar/gradient is identical either way) — but the
        # windowed sampler's (tile, slab) blocking does: the reference
        # draws its pdf quantiles UNSORTED (nerf_utils.py:sample_pdf)
        # and sorts the merged samples afterwards; without a sort, a
        # slab of consecutive fine samples spans the ray's whole in-box
        # segment and ~14% of fine blocks overflow their plane windows,
        # keeping the overflow-fixup lax.cond live (~430 ms/step
        # fwd+bwd at the flagship point). A bitonic values-only sort of
        # (rays, S) has no gathers and costs ~ms.
        z_samples = jnp.sort(z_samples, axis=-1)
        z_samples = jax.lax.stop_gradient(
            z_samples.reshape(b, height, width, depth_samples_per_ray))

        query_points_fine = (
            ray_origins[..., None, :] +
            ray_directions[..., None, :] * z_samples[..., :, None])

        out_fine = sample_fn(query_points_fine, tuple(requests))
        sigma_fine = unflatten(out_fine['sigma'], s_coarse)[..., 0]
        rgb_fine = unflatten(out_fine['rgb'], s_coarse)
        if out_fine.get('overflow_resid') is not None:
            overflow_resid = (out_fine['overflow_resid']
                              if overflow_resid is None else
                              overflow_resid + out_fine['overflow_resid'])

        # No sort-merge: the coarse+fine union is composited in
        # concatenation order via the pairwise-weights formulation
        # (core/compositing.py:compute_weights_unsorted) — every composite
        # output is an order-invariant weighted sum, so the reference's
        # sort + value gather (run.py:259-335) has no TPU-side equivalent.
        cat = lambda a, b: jnp.concatenate((a, b), axis=-2)
        depth_values = jnp.concatenate((z_vals, z_samples), axis=-1)
        sigma = jnp.concatenate((sigma, sigma_fine), axis=-1)
        rgb = cat(rgb, rgb_fine)
        if compute_normals:
            normals = cat(normals, unflatten(out_fine['normals'], s_coarse))
        if compute_semantics:
            semantics = cat(semantics,
                            unflatten(out_fine['semantics'], s_coarse))
        if compute_coords:
            coords = cat(coords, unflatten(out_fine['coords'], s_coarse))

    if coords is not None:
        # Canonical-coordinate rendering reuses the semantics slot
        # (run.py:337-338).
        semantics = coords

    rgb_map, depth_map, mask, normal_map, semantic_map = (
        compositing.render_volume_density(
            sigma, rgb, ray_directions, depth_values,
            normals=normals, semantics=semantics,
            white_background=white_background,
            samples_sorted=not fine_sampling))

    return RenderOutput(rgb=rgb_map, depth=depth_map, mask=mask,
                        normals=normal_map, semantics=semantic_map,
                        overflow_resid=overflow_resid)
