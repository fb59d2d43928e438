"""Converted-weight asset IO (utils/weights.py): the .npz written by
scripts/convert_weights.py round-trips into an APPLY-READY variables
tree. Regression for two real bugs: cli/run.py re-wrapped the loaded
tree under an extra {'params': ...} level (flax then looked for modules
under variables['params']['params']), and cli/inversion.py loaded from
orbax directory names no tool ever produced."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from nerf_from_image_tpu.utils.weights import (flatten_variables,
                                               load_npz_variables,
                                               save_npz_variables)


def test_round_trip_with_collections(tmp_path):
    tree = {
        'params': {'block': {'conv': {'kernel': np.arange(12.0).reshape(
            3, 4).astype(np.float32)}, 'bn_scale': np.ones(4, np.float32)}},
        'batch_stats': {'block': {'mean': np.zeros(4, np.float32),
                                  'var': np.full(4, 2.0, np.float32)}},
    }
    path = str(tmp_path / 'w.npz')
    save_npz_variables(tree, path)
    loaded = load_npz_variables(path)
    # Collection roots survive (no extra nesting added or lost).
    assert set(loaded.keys()) == {'params', 'batch_stats'}
    flat_a = flatten_variables(tree)
    flat_b = flatten_variables(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_loaded_tree_is_apply_ready(tmp_path):
    """module.apply(load(save(init_variables))) must work verbatim."""
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    mod = Tiny()
    x = jnp.ones((2, 5))
    variables = mod.init(jax.random.PRNGKey(0), x)
    path = str(tmp_path / 'tiny.npz')
    save_npz_variables(jax.tree_util.tree_map(np.asarray, variables), path)
    loaded = load_npz_variables(path)
    np.testing.assert_allclose(np.asarray(mod.apply(loaded, x)),
                               np.asarray(mod.apply(variables, x)))


def test_missing_file_returns_none(tmp_path):
    assert load_npz_variables(str(tmp_path / 'absent.npz')) is None


def test_cli_feature_net_loaders_consume_converted_assets(tmp_path):
    """make_inception_apply / make_lpips_apply / the inversion loaders
    must produce the same activations from a saved asset as from the
    in-memory variables (cli/run.py previously double-nested the loaded
    tree and would have failed on every real converted .npz)."""
    from nerf_from_image_tpu.cli import inversion as inv_cli
    from nerf_from_image_tpu.cli import run as run_cli
    from nerf_from_image_tpu.models.inception import InceptionV3FID
    from nerf_from_image_tpu.models.lpips import LPIPS

    os.makedirs(tmp_path / 'weights')

    net = InceptionV3FID()
    x = jnp.zeros((1, 3, 32, 32))
    variables = net.init(jax.random.PRNGKey(0), x)
    save_npz_variables(jax.tree_util.tree_map(np.asarray, variables),
                       str(tmp_path / 'weights' / 'inception.npz'))

    lp = LPIPS()
    a = jnp.zeros((1, 3, 32, 32))
    b = jnp.ones((1, 3, 32, 32)) * 0.5
    lp_vars = lp.init(jax.random.PRNGKey(1), a, b)
    save_npz_variables(jax.tree_util.tree_map(np.asarray, lp_vars),
                       str(tmp_path / 'weights' / 'lpips.npz'))

    class Args:
        root_path = str(tmp_path)

    inc_apply = run_cli.make_inception_apply(Args())
    np.testing.assert_allclose(np.asarray(inc_apply(x)),
                               np.asarray(net.apply(variables, x)),
                               rtol=1e-6, atol=1e-6)
    lp_apply = run_cli.make_lpips_apply(Args())
    np.testing.assert_allclose(
        np.asarray(lp_apply(a, b)),
        np.asarray(lp.apply(lp_vars, a, b, normalize=True)),
        rtol=1e-6, atol=1e-6)

    # The inversion CLI reads the SAME asset paths.
    got = inv_cli.load_lpips_vars(Args(), lp)
    for p, q in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(lp_vars)):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(q))
    inc2 = inv_cli.load_inception_apply(Args())
    np.testing.assert_allclose(np.asarray(inc2(x)),
                               np.asarray(net.apply(variables, x)),
                               rtol=1e-6, atol=1e-6)
