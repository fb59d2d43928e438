"""Hierarchical (PDF) depth resampling and fine-pass merge (pure JAX).

Parity with /root/reference/lib/nerf_utils.py:183-222 (inverse-CDF
sampling) and the fine-pass weight smoothing + sort-merge in
/root/reference/run.py:259-335. Everything is static-shape: the
searchsorted is expressed as a dense comparison-sum (S x S+1 per ray),
which vectorizes onto the TPU VPU instead of a serial binary search.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Inverse-transform sampling of `num_samples` depths per ray.

    Math parity with /root/reference/lib/nerf_utils.py:183-222, but
    gather-free: `searchsorted` + the four `torch.gather`s become masked
    min/max reductions over the (samples, bins) comparison grid — cdf and
    bins are both sorted ascending, so the entry at index `below` (the
    largest j with cdf[j] <= u) is the masked maximum, and `above` the
    masked minimum of the complement. XLA fuses the compare+select+reduce
    into VPU loops; no gather/scatter appears anywhere (XLA TPU gathers
    run ~50x below HBM speed-of-light; this was 385 ms -> ~ms at the
    training operating point).

    Args:
      bins: (..., K) bin positions (sorted ascending; reference passes
        depth midpoints).
      weights: (..., K - 1) interval weights (the CDF then has K entries,
        aligned with `bins`).
      rng: None -> deterministic linspace(0, 1) samples. A float array of
        shape (..., num_samples) is used directly as the uniform draws
        (trajectory-parity injection of the reference's torch.rand,
        nerf_utils.py:202-204).

    Returns:
      samples: (..., num_samples) depths, same dtype as `bins`.
    """
    dtype = bins.dtype
    weights = weights.astype(jnp.float32) + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate((jnp.zeros_like(cdf[..., :1]), cdf), axis=-1)

    if rng is None:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=jnp.float32)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))
    elif jnp.issubdtype(rng.dtype, jnp.floating):
        u = rng.reshape(cdf.shape[:-1] + (num_samples,)).astype(jnp.float32)
    else:
        u = jax.random.uniform(rng, cdf.shape[:-1] + (num_samples,),
                               dtype=jnp.float32)

    bins_f = bins.astype(jnp.float32)
    # m[s, j] = cdf[j] <= u[s]  (cdf[0] = 0 so every sample has >= 1 hit).
    m = cdf[..., None, :] <= u[..., :, None]  # (..., S, K)
    neg = jnp.float32(-jnp.inf)
    pos = jnp.float32(jnp.inf)

    def masked_max(vec):
        return jnp.max(jnp.where(m, vec[..., None, :], neg), axis=-1)

    def masked_min(vec):
        full = jnp.min(jnp.where(m, pos, vec[..., None, :]), axis=-1)
        # All-true mask (u >= 1): clamp to the last entry, matching
        # above = min(inds, K - 1).
        return jnp.minimum(full, vec[..., -1:])

    cdf_below = masked_max(cdf)
    bins_below = masked_max(bins_f)
    cdf_above = masked_min(cdf)
    bins_above = masked_min(bins_f)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return (bins_below + t * (bins_above - bins_below)).astype(dtype)


def smooth_weights_eg3d(weights: jnp.ndarray) -> jnp.ndarray:
    """EG3D-style max-pool(2, pad 1) then avg-pool(2) smoothing + 0.01 floor.

    Matches F.max_pool1d(w, 2, 1, padding=1) -> F.avg_pool1d(., 2, 1) from
    run.py:267-272: output length == input length + 1; callers slice
    [..., 1:-1] as in the reference.
    """
    w = weights
    # max_pool1d(kernel 2, stride 1, padding 1): pad both ends with -inf,
    # output length S + 1.
    pad = jnp.full_like(w[..., :1], -jnp.inf)
    wp = jnp.concatenate((pad, w, pad), axis=-1)
    wmax = jnp.maximum(wp[..., :-1], wp[..., 1:])  # length S + 1... S+1? S+2-1
    # avg_pool1d(kernel 2, stride 1): length S.
    wavg = 0.5 * (wmax[..., :-1] + wmax[..., 1:])
    return wavg + 0.01


def sort_merge(
    z_coarse: jnp.ndarray,
    z_fine: jnp.ndarray,
    *value_pairs: Tuple[jnp.ndarray, jnp.ndarray],
) -> Tuple[jnp.ndarray, ...]:
    """Merges coarse+fine depths into one sorted set and gathers values.

    Args:
      z_coarse, z_fine: (..., S) depths each.
      value_pairs: (coarse_values, fine_values) tuples, each (..., S, C).

    Returns:
      (z_sorted (..., 2S), merged_values... each (..., 2S, C)).
    """
    z_cat = jnp.concatenate((z_coarse, z_fine), axis=-1)
    order = jnp.argsort(z_cat, axis=-1)
    z_sorted = jnp.take_along_axis(z_cat, order, axis=-1)
    outs = [z_sorted]
    for vc, vf in value_pairs:
        v = jnp.concatenate((vc, vf), axis=-2)
        outs.append(jnp.take_along_axis(v, order[..., None], axis=-2))
    return tuple(outs)
