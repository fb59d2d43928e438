"""Triplane sampling kernels (the framework's hottest op).

The reference point-samples each of 3 feature planes with 4-tap bilinear
gathers (models/generator.py:301-331 via grid_sample) — 12 narrow gathers
per 3D point. TPU gathers are row-granular, so here each plane is
pre-packed into a quad table of shape (H*W, 4*C): row (y, x) holds the
2x2 texel neighborhood [p(y,x), p(y,x+1), p(y+1,x), p(y+1,x+1)] with
border clamping. Sampling is then ONE aligned 128-lane row gather per
point per plane, plus a 4-way weighted reduce on the VPU.

Numerics match grid_sample(align_corners=True, padding_mode='border') for
all in-range coordinates; out-of-range coordinates clamp to the border
exactly (the reference's x<-1 case mixes the two clamped taps, which is
also the border texel — identical values).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pack_plane_quads(plane: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, H*W, 4C) quad table with border clamp."""
    b, c, h, w = plane.shape
    p = plane
    p_r = jnp.concatenate([p[..., 1:], p[..., -1:]], axis=-1)
    p_d = jnp.concatenate([p[..., 1:, :], p[..., -1:, :]], axis=-2)
    p_dr = jnp.concatenate([p_d[..., 1:], p_d[..., -1:]], axis=-1)
    quad = jnp.concatenate([p, p_r, p_d, p_dr], axis=1)  # (B, 4C, H, W)
    return quad.reshape(b, 4 * c, h * w).transpose(0, 2, 1)


def _index_weights(gx, gy, h: int, w: int):
    """Normalized [-1, 1] coords -> (flat quad index, 4 bilinear weights)."""
    ix = jnp.clip((gx + 1.0) * 0.5 * (w - 1), 0.0, w - 1.0)
    iy = jnp.clip((gy + 1.0) * 0.5 * (h - 1), 0.0, h - 1.0)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0
    xi = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    flat = yi * w + xi
    wts = jnp.stack(((1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy,
                     fx * fy), axis=-1)
    return flat, wts


def sample_plane_packed(quad_table: jnp.ndarray, gx, gy, h: int,
                        w: int) -> jnp.ndarray:
    """quad_table: (B, H*W, 4C); gx/gy: (B, N). Returns (B, N, C)."""
    b, hw, c4 = quad_table.shape
    c = c4 // 4
    flat, wts = _index_weights(gx, gy, h, w)
    rows = jnp.take_along_axis(quad_table, flat[..., None], axis=1)
    rows = rows.reshape(b, -1, 4, c)
    return jnp.sum(rows * wts[..., None].astype(rows.dtype), axis=2)


def pack_triplane(planes: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, C, R, R) -> (B, 3*R*R, 4C) packed quad tables.

    Pack once per synthesis; every sampler invocation (coarse, fine,
    regularizers) then reuses the table — AD accumulates plane gradients
    across all uses through the pack.
    """
    b, _, c, r, _ = planes.shape
    quads = jax.vmap(pack_plane_quads, in_axes=1, out_axes=1)(planes)
    return quads.reshape(b, 3 * r * r, 4 * c)


def sample_packed_triplane(packed: jnp.ndarray, coords: jnp.ndarray,
                           r: int) -> jnp.ndarray:
    """Averaged triplane features at normalized 3D coords.

    packed: (B, 3*R*R, 4C) from pack_triplane; coords: (B, ..., 3) in
    [-1, 1]. Returns (B, N, C) — equal to (gs(xy, [x,y]) + gs(xz, [x,z])
    + gs(yz, [y,z])) / 3 in the reference formulation
    (generator.py:301-328).
    """
    b = packed.shape[0]
    c = packed.shape[-1] // 4
    pts = coords.reshape(b, -1, 3)
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]

    flat_xy, w_xy = _index_weights(x, y, r, r)
    flat_xz, w_xz = _index_weights(x, z, r, r)
    flat_yz, w_yz = _index_weights(y, z, r, r)
    flat = jnp.concatenate(
        (flat_xy, flat_xz + r * r, flat_yz + 2 * r * r), axis=1)
    wts = jnp.concatenate((w_xy, w_xz, w_yz), axis=1)

    rows = jnp.take_along_axis(packed, flat[..., None], axis=1)
    n = pts.shape[1]
    rows = rows.reshape(b, 3, n, 4, c)
    wts = wts.reshape(b, 3, n, 4, 1).astype(rows.dtype)
    return jnp.sum(rows * wts, axis=(1, 3)) / 3.0


def sample_triplane(planes: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Convenience: pack + sample in one call."""
    return sample_packed_triplane(pack_triplane(planes), coords,
                                  planes.shape[-1])


def sample_triplane_reference(planes: jnp.ndarray,
                              coords: jnp.ndarray) -> jnp.ndarray:
    """Reference formulation via grid_sample2d (for parity testing)."""
    from nerf_from_image_tpu.core import grids
    b = planes.shape[0]
    pts = coords.reshape(b, 1, -1, 3)
    e1 = grids.grid_sample2d(planes[:, 0], pts[..., (0, 1)])
    e2 = grids.grid_sample2d(planes[:, 1], pts[..., (0, 2)])
    e3 = grids.grid_sample2d(planes[:, 2], pts[..., (1, 2)])
    x = (e1 + e2 + e3) / 3.0
    return x.reshape(b, x.shape[1], -1).transpose(0, 2, 1)
