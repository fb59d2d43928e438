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


def _find_adam(s):
    import optax
    if isinstance(s, optax.ScaleByAdamState):
        return s
    if isinstance(s, tuple) and not hasattr(s, '_fields'):
        for x in s:
            r = _find_adam(x)
            if r is not None:
                return r
    return None


def _counts(s):
    """All `count` fields across the optax chain state."""
    out = []
    if hasattr(s, '_fields'):
        if 'count' in s._fields:
            out.append(int(s.count))
        return out
    if isinstance(s, tuple):
        for x in s:
            out.extend(_counts(x))
    return out


def test_optimizer_moments_land_in_state(tiny_state, monkeypatch):
    """optimizer_g maps onto opt_g; optimizer_d's concatenated index
    space (D params then D2 params, reference run.py:684-688) splits
    onto opt_d / opt_d2."""
    import optax

    tagged = lambda sd: {'params': {'tag': np.asarray(sd['tag'])}}
    monkeypatch.setattr(tc, 'convert_generator',
                        lambda sd, **kw: tagged(sd))
    monkeypatch.setattr(tc, 'convert_discriminator', lambda sd: tagged(sd))
    opt = optax.chain(optax.clip_by_global_norm(100.0),
                      optax.adam(lambda c: 1e-3, b1=0.0, b2=0.99))
    tiny = tiny_state.replace(
        opt_g=opt.init(tagged({'tag': np.float32(0.0)})),
        opt_d=opt.init(tagged({'tag': np.float32(0.0)})),
        opt_d2=opt.init(tagged({'tag': np.float32(0.0)})))

    adam_entry = lambda m, v, s: {'step': s,
                                  'exp_avg': np.float32(m),
                                  'exp_avg_sq': np.float32(v)}
    ckpt_t = {
        'model': {'tag': np.float32(1.0)},
        'model_ema': {'tag': np.float32(2.0)},
        'discriminator': {'tag': np.float32(3.0)},
        'discriminator2': {'tag': np.float32(4.0)},
        'optimizer_g': {'state': {0: adam_entry(0.5, 0.25, 7)},
                        'param_groups': [{'params': [0]}]},
        'optimizer_d': {'state': {0: adam_entry(1.5, 2.25, 9),
                                  1: adam_entry(-1.0, 4.0, 9)},
                        'param_groups': [{'params': [0, 1]}]},
        'iteration': 77001,
    }
    state, _ = run_cli.convert_reference_checkpoint(ckpt_t, _Args(), tiny)

    ag = _find_adam(state.opt_g)
    assert float(ag.mu['params']['tag']) == 0.5
    assert float(ag.nu['params']['tag']) == 0.25
    assert _counts(state.opt_g) == [7, 7]  # adam count + lr-warmup count

    ad = _find_adam(state.opt_d)
    assert float(ad.mu['params']['tag']) == 1.5
    assert float(ad.nu['params']['tag']) == 2.25
    ad2 = _find_adam(state.opt_d2)
    assert float(ad2.mu['params']['tag']) == -1.0
    assert float(ad2.nu['params']['tag']) == 4.0
    assert _counts(state.opt_d2) == [9, 9]


def test_optimizer_moment_mismatch_falls_back_fresh(tiny_state, monkeypatch,
                                                    capsys):
    """A checkpoint whose optimizer state cannot be aligned (shape
    mismatch against the reconstructed parameter order) leaves the
    optimizer fresh instead of corrupting it."""
    monkeypatch.setattr(
        tc, 'convert_generator',
        lambda sd, **kw: {'params': {'tag': np.asarray(sd['tag'])}})
    ckpt_t = {
        'model': {'tag': np.zeros((3,), np.float32)},
        'model_ema': {'tag': np.zeros((3,), np.float32)},
        'optimizer_g': {'state': {0: {'step': 2,
                                      'exp_avg': np.zeros((5,), np.float32),
                                      'exp_avg_sq': np.zeros((5,),
                                                             np.float32)}},
                        'param_groups': [{'params': [0]}]},
        'iteration': 10,
    }
    state, _ = run_cli.convert_reference_checkpoint(ckpt_t, _Args(),
                                                    tiny_state)
    assert state.opt_g is tiny_state.opt_g
    assert 'optimizer-moment conversion failed' in capsys.readouterr().out


def test_adam_moment_semantics_match_torch():
    """End-to-end Adam-state conversion semantics: 3 torch steps ->
    convert moments -> a 4th step taken by optax matches a 4th step
    taken by torch (bias correction, eps placement, b1=0 all line up).
    Buffer interleaving and layout transposes are exercised on the way.
    """
    torch = pytest.importorskip('torch')
    import optax

    from nerf_from_image_tpu.train import gan as gan_lib

    rng = np.random.RandomState(0)
    w = rng.randn(4, 3).astype(np.float32)
    b = rng.randn(3).astype(np.float32)
    tw = torch.nn.Parameter(torch.tensor(w))
    tb = torch.nn.Parameter(torch.tensor(b))
    topt = torch.optim.Adam([tw, tb], lr=2e-3, betas=(0.0, 0.99))
    grads = [(rng.randn(4, 3).astype(np.float32),
              rng.randn(3).astype(np.float32)) for _ in range(4)]
    for gw, gb in grads[:3]:
        topt.zero_grad()
        tw.grad = torch.tensor(gw)
        tb.grad = torch.tensor(gb)
        topt.step()

    # Fake module state dict with a buffer interleaved between params.
    sd = {'fc.weight': tw.detach().numpy(),
          'fc.resample_filter': np.zeros((4, 4), np.float32),
          'fc.bias': tb.detach().numpy()}
    conv = lambda s: {'params': {'fc': {'kernel': s['fc.weight'].T,
                                        'bias': s['fc.bias']}}}
    mu, nu, step, n = tc.convert_adam_moments(sd, topt.state_dict(), conv)
    assert n == 2 and step == 3

    params = jax.tree.map(jnp.asarray, conv(sd))
    jopt = optax.chain(optax.clip_by_global_norm(100.0),
                       optax.adam(lambda c: 2e-3, b1=0.0, b2=0.99))
    st = gan_lib.restore_adam_moments(jopt.init(params), mu, nu, step)

    gw, gb = grads[3]
    jgrads = {'params': {'fc': {'kernel': jnp.asarray(gw.T),
                                'bias': jnp.asarray(gb)}}}
    updates, _ = jopt.update(jgrads, st, params)
    new = optax.apply_updates(params, updates)

    topt.zero_grad()
    tw.grad = torch.tensor(gw)
    tb.grad = torch.tensor(gb)
    topt.step()
    np.testing.assert_allclose(np.asarray(new['params']['fc']['kernel']),
                               tw.detach().numpy().T, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new['params']['fc']['bias']),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)


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
