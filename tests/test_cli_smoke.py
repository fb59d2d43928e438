"""End-to-end CLI smoke test (the reference embeds verification in the
runtime rather than a test suite — SURVEY §4; this is the TPU-build's
equivalent of its early-smoke discipline): `cli.run.main()` on a tiny
on-disk SRN fixture drives the full orchestration glue — flag parsing,
dataset load, mesh creation, train-state init, the jitted G/D loop, and
checkpoint save — then the `--resume_from name` form restores the saved
iteration (reference run.py:102-143), and the auto-resume gate discards
warm-up-incomplete runs (<12.5k iterations, run.py:133-143).

Tiny knobs (--plane_resolution/--depth_samples_per_ray/--latent_dim)
keep the graphs small; everything else is the default flag surface.
"""

import os

import numpy as np
import pytest


def _write_srn_fixture(root, n_objects=2, n_views=4, src_res=64):
    """SRN ShapeNet-cars layout (reference data/datasets.py:567-716):
    {root}/shapenet/cars_train/{obj}/{rgb,pose,intrinsics.txt}."""
    import cv2

    rng = np.random.RandomState(0)
    base = os.path.join(root, 'shapenet', 'cars_train')
    for o in range(n_objects):
        d = os.path.join(base, f'obj_{o}')
        os.makedirs(os.path.join(d, 'rgb'))
        os.makedirs(os.path.join(d, 'pose'))
        with open(os.path.join(d, 'intrinsics.txt'), 'w') as f:
            f.write(f'{src_res:.1f} {src_res / 2:.1f} {src_res / 2:.1f} '
                    '0.0\nskew\nheight width\n')
        for v in range(n_views):
            img = (rng.rand(src_res, src_res, 3) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(d, 'rgb', f'{v:06d}.png'), img)
            pose = np.eye(4)
            pose[:3, 3] = [0.05 * v, 0.0, 2.0 + 0.1 * v]
            np.savetxt(os.path.join(d, 'pose', f'{v:06d}.txt'),
                       pose.reshape(1, 16))


def _argv(tmp_path, extra=()):
    return ['--dataset', 'shapenet_cars',
            '--data_path', str(tmp_path),
            '--root_path', str(tmp_path / 'out'),
            '--resolution', '16', '--batch_size', '8',
            '--latent_dim', '16', '--attention_values', '4',
            '--plane_resolution', '32', '--depth_samples_per_ray', '4',
            '--iterations', '2', '--use_pallas', '0'] + list(extra)


def test_cli_orchestration_quick(tmp_path, monkeypatch, capsys):
    """Quick-gate slice of the smoke below: flag parsing, dataset load,
    mesh/state init, experiment-name canonicalized checkpoint routing,
    and checkpoint save — with the jitted train loop stubbed out (its
    execution is covered by test_train_gan and the slow journey)."""
    from nerf_from_image_tpu.cli import run as run_cli
    from nerf_from_image_tpu.train import loop as loop_lib
    from nerf_from_image_tpu.train import pretrain as pretrain_lib

    _write_srn_fixture(str(tmp_path))
    monkeypatch.setattr(pretrain_lib, 'pretrain_sdf',
                        lambda state, *a, **kw: state)
    seen = {}

    def fake_train(state, cfg, split, mesh, num_iters, **kw):
        seen['num_iters'] = num_iters
        seen['n_images'] = len(split.images)
        return state

    monkeypatch.setattr(loop_lib, 'train_gan', fake_train)
    run_cli.main(_argv(tmp_path))
    out = capsys.readouterr().out
    assert 'Training done.' in out
    assert seen == {'num_iters': 2, 'n_images': 8}
    exp = os.listdir(tmp_path / 'out' / 'gan_checkpoints')
    assert len(exp) == 1 and 'shapenet_cars' in exp[0]
    ckpts = os.listdir(tmp_path / 'out' / 'gan_checkpoints' / exp[0])
    assert any('latest' in c for c in ckpts)


@pytest.mark.slow
def test_cli_train_and_resume(tmp_path, monkeypatch, capsys):
    from nerf_from_image_tpu.cli import run as run_cli
    from nerf_from_image_tpu.train import pretrain as pretrain_lib

    _write_srn_fixture(str(tmp_path))
    # SDF pretraining is loop-tested in test_train_gan; stub its 1000
    # iterations so this test exercises the orchestration, not compute.
    pretrain_calls = []

    def fake_pretrain(state, *a, **kw):
        pretrain_calls.append(1)
        return state

    monkeypatch.setattr(pretrain_lib, 'pretrain_sdf', fake_pretrain)

    run_cli.main(_argv(tmp_path))
    out = capsys.readouterr().out
    assert 'Training done.' in out
    assert pretrain_calls == [1]
    # Experiment name canonicalization routed the checkpoint dir
    # (arguments.py:213-267 semantics).
    exp = [d for d in os.listdir(tmp_path / 'out' / 'gan_checkpoints')]
    assert len(exp) == 1 and 'shapenet_cars' in exp[0]

    # Explicit `--resume_from name` restores the saved iteration
    # (run.py:102-132) and the completed run trains no further steps.
    run_cli.main(_argv(tmp_path, ['--resume_from', exp[0]]))
    out = capsys.readouterr().out
    assert 'Resumed from iteration 2' in out
    assert 'Training done.' in out
    assert pretrain_calls == [1]  # iteration != 0 -> no SDF pretrain

    # Auto-resume gate: a latest checkpoint below 12.5k iterations is
    # discarded and training restarts from scratch (run.py:133-143).
    run_cli.main(_argv(tmp_path))
    out = capsys.readouterr().out
    assert 'Aborting resume (training from scratch)' in out
    assert pretrain_calls == [1, 1]
