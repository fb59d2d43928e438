import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.core import grids


def _close(a, b, tol=1e-5):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol, atol=tol)


def test_grid_sample2d(golden):
    out = grids.grid_sample2d(jnp.asarray(golden['gs_img']),
                              jnp.asarray(golden['gs_grid']))
    _close(out, golden['gs_out'], 1e-4)


def test_grid_sample2d_grads_exist():
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (1, 4, 8, 8))
    grid = jax.random.uniform(key, (1, 3, 3, 2), minval=-0.9, maxval=0.9)

    def f(g):
        return jnp.sum(grids.grid_sample2d(img, g) ** 2)

    # First and second order gradients must both be finite (the reference
    # needed a custom kernel for this; JAX composes it automatically).
    g1 = jax.grad(f)(grid)
    assert np.isfinite(np.asarray(g1)).all()
    g2 = jax.grad(lambda g: jnp.sum(jax.grad(f)(g) ** 2))(grid)
    assert np.isfinite(np.asarray(g2)).all()


def test_blur(golden):
    im = jnp.asarray(golden['blur_in'])
    # Separable 1-D decomposition reorders the summation vs the reference's
    # dense 2-D conv; tolerance reflects fp32 accumulation-order noise.
    k100 = grids.blur_kernel_1d(100, 12500)
    _close(grids.blur(im, k100, True), golden['blur_out_i100'], 2e-3)
    k12000 = grids.blur_kernel_1d(12000, 12500)
    _close(grids.blur(im, k12000, False), golden['blur_out_i12000'], 2e-3)
    assert grids.blur_kernel_1d(12500, 12500) is None


def test_sample_volume_stratified_range():
    out = grids.sample_volume_stratified(jax.random.PRNGKey(0), 2, 8, 1.4)
    assert out.shape == (2, 7 * 7 * 7, 3)
    assert np.abs(np.asarray(out)).max() <= 1.4 + 1e-6
