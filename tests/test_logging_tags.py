"""Tensorboard tag-name parity with the reference (run.py:1021-1177,
2288-2306, 2366-2386): the scalar families a reference user greps their
logs for must appear under identical tags."""

import types

import numpy as np

from nerf_from_image_tpu.train import loop as loop_lib


class _Recorder:
    def __init__(self):
        self.tags = {}

    def add_scalar(self, tag, value, step):
        self.tags[tag] = (value, step)


def test_metric_tag_reference_names():
    # Single-discriminator mode.
    assert loop_lib.metric_tag('loss_g', False) == 'loss/g'
    assert loop_lib.metric_tag('loss_r1', False) == 'loss/r1'
    assert loop_lib.metric_tag('loss_d_real', False) == 'loss/d_real'
    # Dual-D mode: the first (conditional) D gets the _cond suffix
    # (run.py:1048-1052, 1141-1146).
    assert loop_lib.metric_tag('loss_g', True) == 'loss/g_cond'
    assert loop_lib.metric_tag('loss_g_uncond', True) == 'loss/g'
    assert loop_lib.metric_tag('loss_r1', True) == 'loss/r1_cond'
    assert loop_lib.metric_tag('loss_r1_uncond', True) == 'loss/r1'
    assert loop_lib.metric_tag('loss_d_real_cond', True) == 'loss/d_real_cond'
    # Fixed families.
    assert loop_lib.metric_tag('grad_norm_g', False) == 'grad_norm/g'
    assert loop_lib.metric_tag('grad_norm_d', False) == 'grad_norm/d'
    assert loop_lib.metric_tag('loss_ppl', False) == 'ppl/loss'
    assert loop_lib.metric_tag('sign_real', False) == 'augment/sign_real'
    assert loop_lib.metric_tag('loss_eikonal', False) == 'loss/eikonal'
    assert loop_lib.metric_tag('loss_tv', False) == 'loss/tv'
    assert loop_lib.metric_tag('loss_entropy', False) == 'loss/entropy'


def test_log_train_scalars_families():
    cfg = types.SimpleNamespace(dual_discriminator=False, augment_p_max=0.8,
                                path_length_regularization=True,
                                use_sdf=True)
    params = {'params': {'beta': np.asarray([0.1]),
                         'alpha': np.asarray([1.0])}}
    state = types.SimpleNamespace(params_g=params, ema_params_g=params,
                                  augment_p=np.asarray(0.25),
                                  ppl_running_avg=np.asarray(3.0))
    metrics = {'loss_g': np.asarray(1.0), 'grad_norm_g': np.asarray(0.5),
               'loss_ppl': np.asarray(0.1)}
    w = _Recorder()
    loop_lib.log_train_scalars(w, metrics, state, cfg, 100, 6.5)

    expected = {'loss/g', 'grad_norm/g', 'ppl/loss', 'ppl/running_avg',
                'augment/p', 'sdf/alpha', 'sdf/beta', 'sdf/alpha_ema',
                'sdf/beta_ema', 'img_per_sec'}
    assert expected <= set(w.tags)
    assert w.tags['augment/p'] == (0.25, 100)
    assert w.tags['sdf/beta'][0] == 0.1


def test_broken_image_sink_warns_once(tmp_path, capsys, monkeypatch):
    """A broken image path must print exactly one warning, not silently
    drop every image (reference crashes loudly; we warn-and-continue)."""
    from nerf_from_image_tpu.utils import logging as log_lib

    w = log_lib.SummaryWriter(str(tmp_path / 'logs'))
    # Force the PNG fallback path and make it fail.
    w._tb = None
    monkeypatch.setitem(__import__('sys').modules, 'PIL', None)
    bad = np.zeros((1, 3, 4, 4), np.float32)
    w.add_images('img/front', bad, 0)
    w.add_images('img/front', bad, 1)
    err = capsys.readouterr().err
    assert err.count('Image logging failed') == 1
    w.close()


def test_inversion_monitor_and_report_tags():
    """The inversion loop writes monitor_b0/{psnr,lpips,rot_error} per
    step and report/* at consolidation (run.py:2288-2306, 2366-2386)."""
    from nerf_from_image_tpu.invert import pipeline as pipe

    report = pipe.make_report([0])
    report[0]['psnr'].append(np.asarray([30.0, 31.0]))
    report[0]['rot_error'].append(np.asarray([5.0]))
    w = _Recorder()
    pipe.consolidate_report(report, writer=w)
    assert 'report/psnr' in w.tags and 'report/rot_error' in w.tags
    assert w.tags['report/psnr'] == (30.5, 0)
