"""Bilinear grid sampling, stratified volume sampling, separable blur.

Parity with /root/reference/lib/ops.py:20-120. `grid_sample2d` is the
gather-based bilinear sampler (border padding, align_corners=True) that the
reference hand-rolled for double-backward support — in JAX arbitrary-order
differentiation comes for free from this formulation. Channel-last layout
internally: on TPU, gathers over the flattened spatial axis with channels
in the lane dimension vectorize far better than channel-first.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def grid_sample2d(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with border padding and align_corners=True.

    Args:
      image: (B, C, H_in, W_in).
      grid: (B, H, W, 2) normalized coords in [-1, 1] (x, y order).

    Returns:
      (B, C, H, W) sampled values. Differentiable to arbitrary order in both
      `image` and `grid`.
    """
    b, c, ih, iw = image.shape
    gh, gw = grid.shape[1], grid.shape[2]

    ix = (grid[..., 0] + 1.0) * 0.5 * (iw - 1)
    iy = (grid[..., 1] + 1.0) * 0.5 * (ih - 1)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)

    # Bilinear corner weights (computed from the *unclamped* coords —
    # border padding clamps only the gather indices, like the reference).
    w_nw = (ix0 + 1.0 - ix) * (iy0 + 1.0 - iy)
    w_ne = (ix - ix0) * (iy0 + 1.0 - iy)
    w_sw = (ix0 + 1.0 - ix) * (iy - iy0)
    w_se = (ix - ix0) * (iy - iy0)

    x0 = jnp.clip(ix0.astype(jnp.int32), 0, iw - 1)
    y0 = jnp.clip(iy0.astype(jnp.int32), 0, ih - 1)
    x1 = jnp.clip(ix0.astype(jnp.int32) + 1, 0, iw - 1)
    y1 = jnp.clip(iy0.astype(jnp.int32) + 1, 0, ih - 1)

    # Flattened-spatial channel-last gather: (B, H*W, C).
    img_flat = image.reshape(b, c, ih * iw).transpose(0, 2, 1)

    def gather(yi, xi):
        idx = (yi * iw + xi).reshape(b, gh * gw)
        return jnp.take_along_axis(img_flat, idx[..., None], axis=1)

    out = (gather(y0, x0) * w_nw.reshape(b, -1, 1) +
           gather(y0, x1) * w_ne.reshape(b, -1, 1) +
           gather(y1, x0) * w_sw.reshape(b, -1, 1) +
           gather(y1, x1) * w_se.reshape(b, -1, 1))
    return out.transpose(0, 2, 1).reshape(b, c, gh, gw)


def sample_volume_stratified(
    rng: jax.Array,
    batch_size: int,
    nstrata: int,
    scene_range: float,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Stratified samples over [-scene_range, scene_range]^3.

    Returns (B, (nstrata-1)^3, 3); one uniform jitter per cell (matches
    lib/ops.py:20-26). `rng` may be a precomputed float array of jitter
    with the (B, n, n, n, 3) cell shape (trajectory-parity injection of
    the reference's torch.rand_like draw, ops.py:25).
    """
    n = nstrata - 1
    ax = jnp.arange(n, dtype=dtype)
    # meshgrid 'xy' over three identical axes.
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing='xy')
    bins = jnp.stack((gx, gy, gz), axis=-1)[None]
    bins = jnp.broadcast_to(bins, (batch_size, n, n, n, 3))
    if jnp.issubdtype(rng.dtype, jnp.floating):
        jitter = rng.reshape(bins.shape).astype(dtype)
    else:
        jitter = jax.random.uniform(rng, bins.shape, dtype=dtype)
    bins = ((bins + jitter) / n) * 2.0 - 1.0
    return bins.reshape(batch_size, n * n * n, 3) * scene_range


def filter2d_separable(im: jnp.ndarray, kernel1d: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D filter with a separable 1D kernel, 'same' padding.

    im: (B, C, H, W); kernel1d: (K,). Runs as two 1-D depthwise convs (the
    XLA-friendly decomposition of the reference's dense K x K conv).
    """
    b, c, h, w = im.shape
    k = kernel1d.shape[0]
    pad = k // 2
    x = im.reshape(b * c, 1, h, w)
    kh = kernel1d.reshape(1, 1, k, 1).astype(im.dtype)
    kw = kernel1d.reshape(1, 1, 1, k).astype(im.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ('NCHW', 'OIHW', 'NCHW'))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1),
                                     [(pad, pad), (0, 0)],
                                     dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1),
                                     [(0, 0), (pad, pad)],
                                     dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
    return x.reshape(b, c, h, w)


def blur_kernel_1d(iteration: int, blur_warmup_iters: int) -> Optional[jnp.ndarray]:
    """Progressive-blur kernel for the current iteration, or None if inactive.

    sigma = max(1 - i/warmup, 0) * 10; kernel = exp2(-(x/sigma)^2),
    normalized (lib/ops.py:42-49). Host-side helper: the kernel length is
    iteration-dependent, so callers treat it as a static argument per
    compilation bucket.
    """
    blur_sigma = max(1.0 - iteration / blur_warmup_iters, 0.0) * 10.0
    blur_size = int(jnp.floor(blur_sigma * 3.0)) if blur_sigma > 0 else 0
    if blur_size <= 0:
        return None
    x = jnp.arange(-blur_size, blur_size + 1, dtype=jnp.float32)
    f = jnp.exp2(-jnp.square(x / blur_sigma))
    return f / jnp.sum(f)


def blur(
    image: jnp.ndarray,
    kernel1d: Optional[jnp.ndarray],
    white_background: bool,
) -> jnp.ndarray:
    """Applies the progressive warmup blur; identity if kernel is None."""
    if kernel1d is None:
        return image
    if white_background:
        image = image - 1.0
    image = filter2d_separable(image, kernel1d)
    if white_background:
        image = image + 1.0
    return image
