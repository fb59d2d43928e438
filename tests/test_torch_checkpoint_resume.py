"""Reference .pth checkpoint -> train-state mapping
(cli/run.py:convert_reference_checkpoint vs reference run.py:872-905):
which checkpoint keys land where, dual-D and encoder-only variants, and
best_fid continuation. Weight converters themselves are golden-tested in
test_weight_parity / test_torch_numeric_parity; here they are stubbed to
verify the glue."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_from_image_tpu.cli import run as run_cli
from nerf_from_image_tpu.train import gan as gan_lib
from nerf_from_image_tpu.utils import torch_convert as tc


class _Args:
    attention_values = 4
    use_viewdir = False
    use_sdf = True


@pytest.fixture()
def tiny_state():
    cfg = gan_lib.GANConfig(resolution=16, latent_dim=16,
                            depth_samples_per_ray=4, fine_sampling=False,
                            attention_values=4, batch_size=4,
                            plane_resolution=32, use_pallas=False,
                            dual_discriminator=True, use_encoder=True)
    return jax.jit(lambda k: gan_lib.init_train_state(k, cfg))(
        jax.random.PRNGKey(0))


def test_checkpoint_keys_land_in_state(tiny_state, monkeypatch):
    tagged = lambda sd: {'params': {'tag': np.asarray(sd['tag'])}}
    monkeypatch.setattr(tc, 'convert_generator',
                        lambda sd, **kw: tagged(sd))
    monkeypatch.setattr(tc, 'convert_discriminator', lambda sd: tagged(sd))

    ckpt_t = {
        'model': {'tag': np.float32(1.0)},
        'model_ema': {'tag': np.float32(2.0)},
        'discriminator': {'tag': np.float32(3.0)},
        'discriminator2': {'tag': np.float32(4.0)},
        'iteration': 77001,
        'augment_p': 0.25,
        'ppl_running_avg': 123.5,
        'best_fid': 41.25,
    }
    state, host_state = run_cli.convert_reference_checkpoint(
        ckpt_t, _Args(), tiny_state)
    assert float(state.params_g['params']['tag']) == 1.0
    assert float(state.ema_params_g['params']['tag']) == 2.0
    assert float(state.params_d['params']['tag']) == 3.0
    assert float(state.params_d2['params']['tag']) == 4.0
    assert int(state.iteration) == 77001
    assert float(state.augment_p) == 0.25
    assert float(state.ppl_running_avg) == 123.5
    assert host_state == {'best_fid': 41.25}


def test_ema_only_checkpoint(tiny_state, monkeypatch):
    """Inference-style checkpoints carry only model_ema (reference
    run.py:898-901: model may be absent)."""
    monkeypatch.setattr(
        tc, 'convert_generator',
        lambda sd, **kw: {'params': {'tag': np.asarray(sd['tag'])}})
    ckpt_t = {'model': None, 'model_ema': {'tag': np.float32(9.0)},
              'iteration': 300000}
    state, host_state = run_cli.convert_reference_checkpoint(
        ckpt_t, _Args(), tiny_state)
    assert float(state.ema_params_g['params']['tag']) == 9.0
    # Untouched pieces keep their initialized values.
    assert state.params_g is tiny_state.params_g
    assert state.params_d is tiny_state.params_d
    assert host_state is None
    # ppl_running_avg absent -> fresh (-1 sentinel).
    assert float(state.ppl_running_avg) == -1.0


def test_converter_kwargs_threaded(tiny_state, monkeypatch):
    seen = {}

    def fake_gen(sd, **kw):
        seen.update(kw)
        return tiny_state.params_g

    monkeypatch.setattr(tc, 'convert_generator', fake_gen)
    run_cli.convert_reference_checkpoint(
        {'model': None, 'model_ema': {}}, _Args(), tiny_state)
    assert seen == {'attention_values': 4, 'use_viewdir': False,
                    'use_sdf': True}
