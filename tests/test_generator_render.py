"""Smoke + invariant tests for the generator and renderer (tiny shapes)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.render import render


@pytest.fixture(scope='module')
def tiny_gen():
    gen = Generator(latent_dim=64, scene_range=0.55, attention_values=4,
                    use_sdf=True, img_resolution=32)
    z = jnp.zeros((2, 64))
    variables = gen.init(jax.random.PRNGKey(0), z)
    return gen, variables


def test_generator_init_and_sample(tiny_gen):
    gen, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    ws = gen.apply(variables, z, method=Generator.map)
    assert ws.shape == (2, 15, 512)
    state = gen.apply(variables, ws, method=Generator.synthesize)
    assert state.planes.shape == (2, 3, 32, 32, 32)
    assert state.attention_values.shape == (2, 4, 3)

    pts = jax.random.uniform(jax.random.PRNGKey(2), (2, 5, 7, 3),
                             minval=-0.5, maxval=0.5)
    out = gen.apply(variables, state, pts,
                    ('sigma', 'rgb', 'sdf_distance', 'coords'),
                    method=Generator.sample)
    assert out['sigma'].shape == (2, 35)
    assert out['rgb'].shape == (2, 35, 3)
    assert np.asarray(out['sigma']).min() >= 0
    # RGB within wide-sigmoid range through the palette.
    assert np.abs(np.asarray(out['rgb'])).max() <= 1.002


def test_generator_oob_sigma_zero(tiny_gen):
    gen, variables = tiny_gen
    z = jnp.zeros((1, 64))
    ws = gen.apply(variables, z, method=Generator.map)
    state = gen.apply(variables, ws, method=Generator.synthesize)
    pts = jnp.full((1, 4, 1, 3), 2.0)  # outside scene_range
    out = gen.apply(variables, state, pts, ('sigma',),
                    method=Generator.sample)
    np.testing.assert_allclose(np.asarray(out['sigma']), 0.0, atol=1e-6)


def test_sdf_losses(tiny_gen):
    gen, variables = tiny_gen
    z = jnp.zeros((2, 64))
    ws = gen.apply(variables, z, method=Generator.map)
    state = gen.apply(variables, ws, method=Generator.synthesize)
    losses = gen.apply(
        variables, state.planes, jax.random.PRNGKey(3),
        ('sdf_eikonal_loss', 'sdf_distance_loss', 'total_variation_loss',
         'entropy_loss'),
        8, method=Generator.sdf_losses)
    for k in ('sdf_eikonal_loss', 'sdf_distance_loss',
              'total_variation_loss', 'entropy_loss'):
        assert losses[k].shape == (2,)
        assert np.isfinite(np.asarray(losses[k])).all()


def test_render_smoke(tiny_gen):
    gen, variables = tiny_gen
    z = jnp.zeros((2, 64))
    ws = gen.apply(variables, z, method=Generator.map)
    state = gen.apply(variables, ws, method=Generator.synthesize)

    def sample_fn(pts, requests):
        return gen.apply(variables, state, pts, requests,
                         method=Generator.sample)

    cam = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    cam = cam.at[:, 2, 3].set(2.0)  # camera at z=+2 looking along -z
    focal = jnp.full((2,), 1.2)

    out = render(sample_fn, 6, 6, cam, focal, None, None,
                 scene_range=0.55, white_background=True,
                 depth_samples_per_ray=8, rng=jax.random.PRNGKey(0),
                 fine_sampling=True, compute_semantics=True)
    assert out.rgb.shape == (2, 6, 6, 3)
    assert out.depth.shape == (2, 6, 6)
    assert out.mask.shape == (2, 6, 6)
    assert out.semantics.shape == (2, 6, 6, 4)
    assert np.isfinite(np.asarray(out.rgb)).all()

    # Deterministic render is reproducible.
    out2 = render(sample_fn, 6, 6, cam, focal, None, None,
                  scene_range=0.55, white_background=True,
                  depth_samples_per_ray=8, rng=None, fine_sampling=True)
    out3 = render(sample_fn, 6, 6, cam, focal, None, None,
                  scene_range=0.55, white_background=True,
                  depth_samples_per_ray=8, rng=None, fine_sampling=True)
    np.testing.assert_allclose(np.asarray(out2.rgb), np.asarray(out3.rgb))


def test_render_grad_flows_to_camera(tiny_gen):
    gen, variables = tiny_gen
    z = jnp.zeros((1, 64))
    ws = gen.apply(variables, z, method=Generator.map)
    state = gen.apply(variables, ws, method=Generator.synthesize)

    def sample_fn(pts, requests):
        return gen.apply(variables, state, pts, requests,
                         method=Generator.sample)

    def loss(focal):
        cam = jnp.broadcast_to(jnp.eye(4), (1, 4, 4)).at[:, 2, 3].set(2.0)
        out = render(sample_fn, 4, 4, cam, focal, None, None,
                     scene_range=0.55, white_background=True,
                     depth_samples_per_ray=6, rng=None, fine_sampling=False)
        return jnp.sum(out.rgb ** 2)

    g = jax.grad(loss)(jnp.full((1,), 1.2))
    assert np.isfinite(np.asarray(g)).all()
