"""MXU-native bilinear image warp via the windowed triplane kernel.

The inversion loss warps the predicted render into 15 random affine crops
per image (reference /root/reference/run.py:2216-2235). On TPU the XLA
formulation is index-bound twice over: the forward is a 4-tap gather per
output pixel and its VJP is a scatter-add back into the image (~13.7
ns/row regardless of width — ~260 ms/step at batch 8). Rotations make
the warp non-separable, so no matmul factorization exists in image space.

The windowed triplane sampler (`triplane_window.py`) already solves
exactly this problem — arbitrary-position bilinear gathers as one-hot
MXU matmuls over VMEM-resident windows — so this module reuses it:

- The image is embedded in plane 0 of a zero-padded (3, C, R, R) plane
  set, R = H + 2*margin. The zero margin IS the grid_sample
  zeros-padding: out-of-image taps land on zero texels, and coordinates
  beyond the margin are clamped into it (their true value is zero
  either way), so semantics match `_grid_sample_zeros` exactly without
  any masking. Planes 1/2 are zero and the z coordinate is constant, so
  their contribution to the kernel's plane sum is identically zero.
- Crop pixels are packed into kernel blocks as 16x16 patches (a block
  holds one patch: 8x8 tile x 4 slab). A 16px patch spans at most
  16*scale*(|cos|+|sin|) + 1 ~ 36 source texels in u and v, inside the
  48x128 window for any rotation at scale <~ 2 — zero overflow for the
  augment's scale distribution (exp2(N(0, 0.2))); the fixed-capacity
  fixup in `sample_triplane_windowed` keeps the >5-sigma tail exact.
- The warp grid is data (the transform is sampled, not optimized), so
  the kernel's planes-only backward applies: the image gradient arrives
  by window scatter-accumulate in VMEM — no XLA scatter anywhere.

Channels: C=32 per plane; callers can stack several logical images
(e.g. pred + stop-gradient target — which ALSO makes the shared
pred/target transform structural) into one call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nerf_from_image_tpu.ops.pallas import triplane_window as tw

MARGIN = 8  # zero-texel border; >= 2 (clamp ring must stay in zeros)


def _pack_grid(grid: jnp.ndarray):
    """(B, N, H, W, 2) crop grids -> blocked (B, H', W', S, 2) with one
    16x16 crop patch per kernel block. Pure reshape/transpose.

    y = PY*16 + th*2 + a, x = PX*16 + tw*2 + b_;
    h' = (n*(H/16) + PY)*8 + th, w' = PX*8 + tw, s = a*2 + b_.
    """
    b, n, h, w, _ = grid.shape
    assert h % 16 == 0 and w % 16 == 0, (h, w)
    g = grid.reshape(b, n, h // 16, 8, 2, w // 16, 8, 2, 2)
    #                b  n  PY      th a  PX      tw b_
    g = g.transpose(0, 1, 2, 3, 5, 6, 4, 7, 8)
    #               b  n  PY th PX tw a  b_
    return g.reshape(b, n * (h // 16) * 8, (w // 16) * 8, 4, 2)


def _unpack_feats(feats: jnp.ndarray, b, n, h, w):
    """(B, H'*W'*S, C) kernel output (renderer point order: h-major,
    then w, then s) -> (B, N, C, H, W)."""
    c = feats.shape[-1]
    f = feats.reshape(b, n, h // 16, 8, w // 16, 8, 2, 2, c)
    #                 b  n  PY      th PX      tw a  b_ c
    f = f.transpose(0, 1, 8, 2, 3, 6, 4, 5, 7)
    #               b  n  c  PY th a  PX tw b_
    return f.reshape(b, n, c, h, w)


def grid_sample_zeros_windowed(images: jnp.ndarray, grid: jnp.ndarray,
                               margin: int = MARGIN) -> jnp.ndarray:
    """Bilinear sample with zeros padding, align_corners=False — the
    semantics of `core.augment._grid_sample_zeros` — on the windowed
    Pallas kernel.

    Args:
      images: (B, C_img, H, H) source images, C_img <= 32, H % 16 == 0.
      grid: (B, N, H_out, W_out, 2) torch-convention xy sample grids
        (N crops per image), H_out/W_out % 16 == 0.

    Returns:
      (B, N, C_img, H_out, W_out) in the images' dtype (values bf16-
      rounded: the kernel's plane storage is bf16 with f32 tap
      accumulation).
    """
    b, c_img, ih, iw = images.shape
    assert ih == iw, 'square source images only'
    assert c_img <= tw.C
    _, n, gh, gw, _ = grid.shape
    r = ih + 2 * margin

    # Embed: channel-pad to C, zero-margin pad, planes 1/2 zero.
    planes = jnp.pad(images.astype(jnp.bfloat16),
                     ((0, 0), (0, tw.C - c_img), (margin, margin),
                      (margin, margin)))
    planes = jnp.pad(planes[:, None], ((0, 0), (0, 2), (0, 0), (0, 0),
                                       (0, 0)))  # (B, 3, C, R, R)
    planes_dma = tw.plane_layout_for_dma(planes)

    # Source pixel coords (align_corners=False), clamped into the zero
    # margin, mapped to the kernel's align_corners=True plane coords.
    g = _pack_grid(grid)
    ix = ((g[..., 0] + 1.0) * iw - 1.0) / 2.0
    iy = ((g[..., 1] + 1.0) * ih - 1.0) / 2.0
    lo, hi = 1.0 - margin, ih + margin - 2.0
    tx = jnp.clip(ix, lo, hi) + margin  # plane texel in [1, r-2]
    ty = jnp.clip(iy, lo, hi) + margin
    cx = 2.0 * tx / (r - 1.0) - 1.0
    cy = 2.0 * ty / (r - 1.0) - 1.0
    cz = jnp.zeros_like(cx)
    coords = jnp.stack((cx, cy, cz), axis=-1)  # (B, H', W', S, 3)

    feats, _ = tw.sample_triplane_windowed(planes, planes_dma, None,
                                           coords, coord_grads=False)
    # The triplane convention is the MEAN over the 3 plane samples
    # (ops/triplane.py:100); planes 1/2 are zero here, so x3 recovers
    # the plane-0 bilinear sample.
    out = _unpack_feats(feats[..., :c_img].astype(jnp.float32) * 3.0,
                        b, n, gh, gw)
    return out.astype(images.dtype)
