"""ADA-style augmentation: rotation/scale/translation on images + poses.

Parity with /root/reference/run.py:720-818: per-sample Bernoulli(p) gating
of each transform, affine resampling of the image (zeros padding,
align_corners=False, with the white-background -1 shift), and the matching
camera-pose/focal compensation so the rendered geometry stays consistent.
Fully jittable: `p` is a traced scalar, transforms are drawn from explicit
keys, and the cached-transform path reuses a Transform pytree.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from nerf_from_image_tpu.core import pose as pose_utils


@flax.struct.dataclass
class AffineTransform:
    rot: jnp.ndarray  # (B,)
    scale: jnp.ndarray  # (B,)
    translation: jnp.ndarray  # (B, 2)


def sample_transform(rng: jax.Array, batch_size: int, p,
                     disable_scale: bool = False) -> AffineTransform:
    k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
    rot = (jax.random.uniform(k1, (batch_size,)) - 0.5) * 2.0 * jnp.pi
    rot = rot * (jax.random.uniform(k2, (batch_size,)) < p)

    if disable_scale:
        scale = jnp.ones((batch_size,))
    else:
        scale = jnp.exp2(jax.random.normal(k3, (batch_size,)) * 0.2)
        gate = (jax.random.uniform(k4, (batch_size,)) < p).astype(scale.dtype)
        scale = 1.0 + (scale - 1.0) * gate

    translation = jax.random.normal(k5, (batch_size, 2)) * 0.1
    gate = (jax.random.uniform(k6, (batch_size, 1)) < p).astype(
        translation.dtype)
    translation = translation * gate
    return AffineTransform(rot=rot, scale=scale, translation=translation)


def _affine_mat(tform: AffineTransform) -> jnp.ndarray:
    """(B, 2, 3) torch-convention affine matrix (rotation + translation)."""
    c, s = jnp.cos(tform.rot), jnp.sin(tform.rot)
    t = tform.translation
    row0 = jnp.stack((c, -s, t[:, 0]), axis=-1)
    row1 = jnp.stack((s, c, -t[:, 1]), axis=-1)
    return jnp.stack((row0, row1), axis=1)


def _grid_sample_zeros(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample, zeros padding, align_corners=False. NCHW/NHWC-grid."""
    b, c, ih, iw = image.shape
    gh, gw = grid.shape[1], grid.shape[2]
    ix = ((grid[..., 0] + 1.0) * iw - 1.0) / 2.0
    iy = ((grid[..., 1] + 1.0) * ih - 1.0) / 2.0

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    w_nw = (ix0 + 1.0 - ix) * (iy0 + 1.0 - iy)
    w_ne = (ix - ix0) * (iy0 + 1.0 - iy)
    w_sw = (ix0 + 1.0 - ix) * (iy - iy0)
    w_se = (ix - ix0) * (iy - iy0)

    img_flat = image.reshape(b, c, ih * iw).transpose(0, 2, 1)

    def tap(yi, xi, w):
        valid = ((xi >= 0) & (xi <= iw - 1) & (yi >= 0) &
                 (yi <= ih - 1)).astype(image.dtype)
        xc = jnp.clip(xi, 0, iw - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, ih - 1).astype(jnp.int32)
        idx = (yc * iw + xc).reshape(b, gh * gw)
        vals = jnp.take_along_axis(img_flat, idx[..., None], axis=1)
        return vals * (w * valid).reshape(b, -1, 1)

    out = (tap(iy0, ix0, w_nw) + tap(iy0, ix0 + 1, w_ne) +
           tap(iy0 + 1, ix0, w_sw) + tap(iy0 + 1, ix0 + 1, w_se))
    return out.transpose(0, 2, 1).reshape(b, c, gh, gw)


def _affine_grid(mat: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """F.affine_grid(align_corners=False) for output size (h, w)."""
    ys = (2.0 * jnp.arange(h) + 1.0) / h - 1.0
    xs = (2.0 * jnp.arange(w) + 1.0) / w - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (h, w) each
    ones = jnp.ones_like(gx)
    base = jnp.stack((gx, gy, ones), axis=-1)  # (h, w, 3)
    return jnp.einsum('bij,hwj->bhwi', mat, base)


def image_warp_grid(tform: AffineTransform, h: int, w: int) -> jnp.ndarray:
    """The image-warp sampling grid (B, h, w, 2) for a transform —
    the exact grid `augment_impl` samples the image with (scale applied
    multiplicatively, translation rotated back through the rotation
    block, run.py:752-756). Exposed so alternate sampling backends (the
    windowed Pallas warp) share one source of truth for the geometry."""
    mat = _affine_mat(tform)
    scale = tform.scale
    mat_scaled = mat * scale[:, None, None]
    t_rot = jnp.einsum('bij,bj->bi', mat[:, :2, :2], mat_scaled[:, :, 2])
    mat_scaled = mat_scaled.at[:, :, 2].set(t_rot)
    return _affine_grid(mat_scaled, h, w)


def augment_impl(
    img: Optional[jnp.ndarray],
    pose: Optional[jnp.ndarray],
    focal: Optional[jnp.ndarray],
    tform: AffineTransform,
    white_background: bool,
):
    """Applies a sampled transform to image (NCHW) and/or pose+focal."""
    mat = _affine_mat(tform)
    img_out = None
    if img is not None:
        grid = image_warp_grid(tform, img.shape[-2], img.shape[-1])
        if white_background:
            img = img - 1.0
        img_out = _grid_sample_zeros(img, grid)
        if white_background:
            img_out = img_out + 1.0

    pose_out, focal_out = pose, focal
    if pose is not None:
        b = pose.shape[0]
        m = jnp.broadcast_to(jnp.eye(4, dtype=pose.dtype), (b, 4, 4))
        m = m.at[:, :2, :2].set(mat[:, :2, :2])
        if focal is not None:
            focal_out = focal / tform.scale
        pose_new = pose @ jnp.swapaxes(m, -2, -1)
        if focal is None:
            pose_new = pose_new.at[:, :3, :3].multiply(
                tform.scale[:, None, None])
            pose_new = pose_new.at[:, 3:4, 3:4].multiply(
                tform.scale[:, None, None])

        pose_orig = pose_new
        cam_inv = pose_utils.invert_space(pose_new)
        if focal is not None:
            shift = tform.translation * (-cam_inv[:, 2:3, 3] /
                                         (2.0 * focal_out[:, None]))
        else:
            shift = tform.translation * pose_orig[:, 3:4, 3]
        cam_inv = cam_inv.at[:, :2, 3].add(-shift)
        pose_out = pose_utils.invert_space(cam_inv)
        if focal is None:
            pose_out = pose_out.at[:, :3, :3].multiply(
                pose_orig[:, 3:4, 3:4])
            pose_out = pose_out.at[:, 3, 3].multiply(pose_orig[:, 3, 3])

    return img_out, pose_out, focal_out


def augment(
    rng: jax.Array,
    img: Optional[jnp.ndarray],
    pose: Optional[jnp.ndarray],
    focal: Optional[jnp.ndarray],
    p,
    white_background: bool,
    disable_scale: bool = False,
    cached_tform: Optional[AffineTransform] = None,
):
    """Samples (or reuses) a transform and applies it. Returns
    (img, pose, focal, tform)."""
    bs = img.shape[0] if img is not None else pose.shape[0]
    tform = (cached_tform if cached_tform is not None else
             sample_transform(rng, bs, p, disable_scale))
    img_o, pose_o, focal_o = augment_impl(img, pose, focal, tform,
                                          white_background)
    return img_o, pose_o, focal_o, tform
