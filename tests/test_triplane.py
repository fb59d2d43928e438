import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.ops import triplane


def test_packed_matches_reference_in_range():
    key = jax.random.PRNGKey(0)
    planes = jax.random.normal(key, (2, 3, 8, 16, 16))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (2, 5, 7, 3),
                                minval=-1.0, maxval=1.0)
    fast = triplane.sample_triplane(planes, coords)
    ref = triplane.sample_triplane_reference(planes, coords)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_packed_matches_reference_at_border():
    key = jax.random.PRNGKey(2)
    planes = jax.random.normal(key, (1, 3, 4, 8, 8))
    # Exactly -1/1 coords and slightly outside.
    coords = jnp.asarray([[[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0],
                           [1.0, -1.0, 0.3], [-1.2, 0.5, 1.3]]])
    fast = triplane.sample_triplane(planes, coords)
    ref = triplane.sample_triplane_reference(planes, coords)
    # First three are in-range (exact parity); the OOB one clamps to the
    # same border texel in both formulations.
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_gradients_flow_to_planes_and_coords():
    planes = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4, 8, 8))
    coords = jax.random.uniform(jax.random.PRNGKey(4), (1, 6, 3),
                                minval=-0.9, maxval=0.9)

    def f(planes, coords):
        return jnp.sum(triplane.sample_triplane(planes, coords) ** 2)

    gp, gc = jax.grad(f, argnums=(0, 1))(planes, coords)
    assert np.isfinite(np.asarray(gp)).all() and np.abs(
        np.asarray(gp)).sum() > 0
    assert np.isfinite(np.asarray(gc)).all() and np.abs(
        np.asarray(gc)).sum() > 0
    # Second-order (needed for eikonal loss).
    g2 = jax.grad(lambda c: jnp.sum(jax.grad(f, argnums=1)(planes, c) ** 2))(
        coords)
    assert np.isfinite(np.asarray(g2)).all()
