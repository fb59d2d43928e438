import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.models import stylegan


def _close(a, b, tol=1e-4):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol, atol=tol)


def test_filter2d(golden):
    x = jnp.asarray(golden['us_in'])
    _close(stylegan.filter2d(x, stylegan.bilinear_filter()), golden['f2d_out'])
    _close(stylegan.filter2d(x, stylegan.bilinear_filter(), transpose=True),
           golden['f2d_t_out'])


def test_up_down_sample(golden):
    x = jnp.asarray(golden['us_in'])
    _close(stylegan.upsample2d(x, stylegan.bilinear_filter()),
           golden['us_out'])
    _close(stylegan.downsample2d(x, stylegan.bilinear_filter()),
           golden['ds_out'])


def test_conv_modulated(golden):
    x = jnp.asarray(golden['mc_x'])
    w = jnp.asarray(golden['mc_w'])
    styles = jnp.asarray(golden['mc_styles'])
    f = stylegan.bilinear_filter()
    _close(stylegan.conv_modulated2d(x, w, styles, padding=1,
                                     resample_filter=f),
           golden['mc_plain'], 2e-4)
    _close(stylegan.conv_modulated2d(x, w, styles, up=True, padding=1,
                                     resample_filter=f),
           golden['mc_up'], 2e-4)
    _close(stylegan.conv_modulated2d(x, w, styles, padding=1,
                                     demodulate=False, resample_filter=f),
           golden['mc_nodemod'], 2e-4)


def test_minibatch_std_shape():
    x = jnp.ones((8, 6, 4, 4))
    y = stylegan.minibatch_std(x, group_size=4)
    assert y.shape == (8, 7, 4, 4)
    # Constant input -> zero (eps) std channel.
    assert np.asarray(y[:, 6]).max() < 1e-3
