"""Windowed-kernel image warp (ops/pallas/warp.py) vs the XLA
grid-sample path: forward values, zeros-padding semantics, gradient wrt
the image, and end-to-end equality with augment_impl's warp (the
inversion 15-crop path). Runs the kernel in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_from_image_tpu.core import augment as augment_lib
from nerf_from_image_tpu.ops.pallas import warp as warp_lib

B, C, H, N = 2, 3, 32, 2


def _random_tform(seed, p=1.0):
    return augment_lib.sample_transform(jax.random.PRNGKey(seed), B * N, p)


def _grids(tform):
    return augment_lib.image_warp_grid(tform, H, H).reshape(B, N, H, H, 2)


def _grids_for_seed(seed, p=1.0):
    return _grids(_random_tform(seed, p))


def _images(seed):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(-1, 1, (B, C, H, H)).astype(np.float32))


def _xla_warp(images, grid):
    """Reference path: _grid_sample_zeros per crop."""
    rep = jnp.repeat(images, N, axis=0)
    out = augment_lib._grid_sample_zeros(rep, grid.reshape(B * N, H, H, 2))
    return out.reshape(B, N, C, H, H)


def test_forward_matches_xla_grid_sample():
    images = _images(0)
    grid = _grids_for_seed(1)
    ours = warp_lib.grid_sample_zeros_windowed(images, grid)
    ref = _xla_warp(images, grid)
    # bf16 plane storage: ~8-bit mantissa on [-1, 1] values.
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-2)
    # Rotated crops must show the zeros padding (exact zeros where the
    # XLA path is exactly zero).
    zero_mask = np.asarray(ref) == 0.0
    assert zero_mask.any(), 'expected some out-of-image zeros'
    assert np.all(np.asarray(ours)[zero_mask] == 0.0)


def test_gradient_matches_xla():
    images = _images(2)
    grid = _grids_for_seed(3)
    w = jnp.asarray(np.random.RandomState(4).uniform(
        -1, 1, (B, N, C, H, H)).astype(np.float32))

    g_ours = jax.grad(lambda im: jnp.sum(
        warp_lib.grid_sample_zeros_windowed(im, grid) * w))(images)
    g_ref = jax.grad(lambda im: jnp.sum(_xla_warp(im, grid) * w))(images)
    denom = float(jnp.max(jnp.abs(g_ref))) + 1e-8
    rel = float(jnp.max(jnp.abs(g_ours - g_ref))) / denom
    assert rel < 0.05, rel


def test_matches_augment_impl_with_white_background():
    """The integration recipe (shift -1, warp, shift +1) equals
    augment_impl's white-background image path for the same transform."""
    images = _images(5)
    tform = _random_tform(6)
    ref, _, _ = augment_lib.augment_impl(
        jnp.repeat(images, N, axis=0), None, None, tform,
        white_background=True)
    grid = _grids(tform)
    out = warp_lib.grid_sample_zeros_windowed(images - 1.0, grid) + 1.0
    np.testing.assert_allclose(
        np.asarray(out.reshape(B * N, C, H, H)), np.asarray(ref),
        atol=2e-2)


def test_identity_transform_roundtrip():
    """p=0 -> identity transforms: the warp must return the image
    (bf16-rounded)."""
    images = _images(7)
    tform = _random_tform(8, p=0.0)
    grid = _grids(tform)
    # p=0 gates rotation/translation off; scale is 1 by construction.
    out = warp_lib.grid_sample_zeros_windowed(images, grid)
    ref = jnp.repeat(images, N, axis=0).reshape(B, N, C, H, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-2)


@pytest.mark.slow
def test_inversion_loss_paths_agree():
    """inversion_loss with use_pallas_warp on/off: same transforms, same
    loss within bf16 tolerance (tiny generator, CPU interpret mode)."""
    import dataclasses
    from nerf_from_image_tpu.invert import optimizer as inv_opt
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.models.lpips import LPIPS

    bs = 1
    gen = Generator(latent_dim=16, scene_range=0.55, attention_values=4,
                    use_sdf=True, img_resolution=32, use_pallas=False)
    gen_vars = jax.jit(gen.init)(jax.random.PRNGKey(0), jnp.zeros((bs, 16)))
    lpips = LPIPS()
    lpips_vars = jax.jit(lpips.init)(jax.random.PRNGKey(1),
                                     jnp.zeros((1, 3, 32, 32)),
                                     jnp.zeros((1, 3, 32, 32)))
    cfg = inv_opt.InversionConfig(resolution=32, depth_samples_per_ray=4,
                                  fine_sampling=False, num_augmentations=2)
    params = inv_opt.InversionParams(
        z=jnp.zeros((bs, 1, 512)),
        R=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (bs, 1)),
        s=jnp.ones((bs,)) * 2.0, t2=jnp.zeros((bs, 2)),
        z0=jnp.zeros((bs,)))
    target = jax.random.uniform(jax.random.PRNGKey(2), (bs, 32, 32, 3),
                                minval=-1.0, maxval=1.0)
    rng = jax.random.PRNGKey(3)

    loss_x, mon_x = inv_opt.inversion_loss(gen, gen_vars, lpips,
                                           lpips_vars, params, target,
                                           cfg, rng)
    cfg_p = dataclasses.replace(cfg, use_pallas_warp=True)
    loss_p, mon_p = inv_opt.inversion_loss(gen, gen_vars, lpips,
                                           lpips_vars, params, target,
                                           cfg_p, rng)
    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(mon_p['psnr']),
                               np.asarray(mon_x['psnr']), rtol=1e-4)
