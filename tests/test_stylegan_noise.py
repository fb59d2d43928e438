"""StyleGAN per-layer noise injection parity.

The reference disables noise by default (arguments.py:150's always-True
`--disable_stylegan_noise` quirk) but re-enables it for cub and
imagenet_elephant (data/loaders.py:93,106); enabled models run
noise_mode='random' on every forward (models/stylegan.py:325 default —
no caller ever sets freeze_noise). Our Generator carries the policy as
`use_stylegan_noise` and resolves noise_mode=None to random (rng given) /
const (no rng) / none (disabled).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_from_image_tpu import config as config_lib
from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.train import gan as gan_lib


def _tiny_gen(use_noise):
    return Generator(latent_dim=32, scene_range=0.55, attention_values=4,
                     use_sdf=True, img_resolution=16, use_pallas=False,
                     use_stylegan_noise=use_noise)


def _set_noise_strengths(variables, value):
    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k == 'noise_strength':
                out[k] = jnp.full_like(v, value)
            else:
                out[k] = v
        return out
    return {c: walk(t) if c == 'params' else t for c, t in variables.items()}


def test_noise_params_created_and_modes_differ():
    gen = _tiny_gen(True)
    z = jnp.zeros((2, 32))
    variables = gen.init(jax.random.PRNGKey(0), z)
    flat = jax.tree_util.tree_leaves_with_path(variables)
    names = {jax.tree_util.keystr(p) for p, _ in flat}
    assert any('noise_strength' in n for n in names)
    assert any('noise_const' in n for n in names)

    # Learned strengths init to zero (stylegan.py:321) -> all modes agree.
    ws = gen.apply(variables, jax.random.normal(jax.random.PRNGKey(1),
                                                (2, 32)),
                   method=Generator.map)
    w_synth = ws[:, :14]
    p_none = gen.apply(variables, w_synth, noise_mode='none',
                       method=Generator.synthesize_planes)
    p_rand = gen.apply(variables, w_synth, noise_rng=jax.random.PRNGKey(2),
                       method=Generator.synthesize_planes)
    p_const = gen.apply(variables, w_synth,
                        method=Generator.synthesize_planes)
    np.testing.assert_allclose(np.asarray(p_none), np.asarray(p_rand),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_none), np.asarray(p_const),
                               atol=1e-6)

    # Nonzero strengths: random differs per rng; const is deterministic
    # and distinct from none.
    noisy = _set_noise_strengths(variables, 0.5)
    r1 = gen.apply(noisy, w_synth, noise_rng=jax.random.PRNGKey(3),
                   method=Generator.synthesize_planes)
    r2 = gen.apply(noisy, w_synth, noise_rng=jax.random.PRNGKey(4),
                   method=Generator.synthesize_planes)
    c1 = gen.apply(noisy, w_synth, method=Generator.synthesize_planes)
    c2 = gen.apply(noisy, w_synth, method=Generator.synthesize_planes)
    assert np.abs(np.asarray(r1) - np.asarray(r2)).max() > 1e-4
    assert np.abs(np.asarray(r1) - np.asarray(p_none)).max() > 1e-4
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=0)
    assert np.abs(np.asarray(c1) - np.asarray(p_none)).max() > 1e-4


def test_disabled_model_ignores_noise_rng():
    gen = _tiny_gen(False)
    z = jnp.zeros((2, 32))
    variables = gen.init(jax.random.PRNGKey(0), z)
    ws = gen.apply(variables, jax.random.normal(jax.random.PRNGKey(1),
                                                (2, 32)),
                   method=Generator.map)
    w_synth = ws[:, :14]
    a = gen.apply(variables, w_synth, noise_rng=jax.random.PRNGKey(5),
                  method=Generator.synthesize_planes)
    b = gen.apply(variables, w_synth, noise_rng=jax.random.PRNGKey(6),
                  method=Generator.synthesize_planes)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_config_threading():
    cfg = gan_lib.GANConfig(resolution=8, latent_dim=32,
                            use_stylegan_noise=True, attention_values=4,
                            plane_resolution=16, use_pallas=False)
    gen, _ = gan_lib.make_models(cfg)
    assert gen.use_stylegan_noise

    # Overrides apply at dataset-load time (reference data/loaders.py:90).
    args = config_lib.parse_args(['--dataset', 'cub'])
    config_lib.override_default_args(args)
    assert not args.disable_stylegan_noise  # cub override enables noise
    args = config_lib.parse_args(['--dataset', 'p3d_car'])
    config_lib.override_default_args(args)
    assert args.disable_stylegan_noise


@pytest.mark.slow
def test_g_step_with_noise_enabled():
    """The jitted G step runs under grad with noise on (flax param
    creation happened at init; apply must not try to create any)."""
    cfg = gan_lib.GANConfig(resolution=8, latent_dim=32,
                            depth_samples_per_ray=4, fine_sampling=False,
                            attention_values=4, batch_size=4,
                            plane_resolution=16, use_pallas=False,
                            use_stylegan_noise=True)
    gen, disc = gan_lib.make_models(cfg)
    opt_g, _ = gan_lib.make_optimizers(cfg)
    state = jax.jit(lambda k: gan_lib.init_train_state(k, cfg))(
        jax.random.PRNGKey(0))
    pose = jnp.broadcast_to(jnp.eye(4), (4, 4, 4)).at[:, 2, 3].set(4.0)
    batch = {'pose': pose, 'focal': jnp.full((4,), 1.2),
             'z': jax.random.normal(jax.random.PRNGKey(1), (4, 32))}
    state2, metrics = jax.jit(
        lambda s, b: gan_lib.g_step(s, b, gen, disc, opt_g, cfg))(
            state, batch)
    assert np.isfinite(float(metrics['loss_g']))
