"""Inversion report machinery: straggler masking, checkpoint resume,
consolidation with FID (VERDICT #8)."""

import numpy as np

from nerf_from_image_tpu.invert import pipeline as pipe
from nerf_from_image_tpu.metrics import fid as fid_lib


def test_report_checkpoint_roundtrip(tmp_path):
    report = pipe.make_report([0, 30])
    rng = np.random.RandomState(0)
    for _ in range(3):  # three batches
        for step in (0, 30):
            report[step]['psnr'].append(rng.rand(4).astype(np.float32))
            report[step]['ws'].append(rng.rand(4, 15, 8).astype(np.float32))
    path = str(tmp_path / 'report_checkpoint.npz')
    key = np.asarray([1, 2], np.uint32)
    pipe.save_report_checkpoint(path, report, idx=12, key=key)

    fresh = pipe.make_report([0, 30])
    idx, key2 = pipe.load_report_checkpoint(path, fresh)
    assert idx == 12
    np.testing.assert_array_equal(key2, key)
    for step in (0, 30):
        assert len(fresh[step]['psnr']) == 3
        np.testing.assert_array_equal(
            np.concatenate(fresh[step]['psnr']),
            np.concatenate(report[step]['psnr']))
        np.testing.assert_array_equal(fresh[step]['ws'][2],
                                      report[step]['ws'][2])
        assert fresh[step]['lpips'] == []

    # Missing file -> clean start.
    idx0, key0 = pipe.load_report_checkpoint(str(tmp_path / 'none.npz'),
                                             pipe.make_report([0]))
    assert idx0 == 0 and key0 is None


def test_consolidate_with_fid_and_straggler_masking():
    report = pipe.make_report([0])
    rng = np.random.RandomState(1)
    acts_fake = rng.rand(16, 32).astype(np.float64)
    report[0]['psnr'] = [np.asarray([10.0, 20.0]), np.asarray([30.0])]
    report[0]['inception_activations_front'] = [acts_fake]
    real_stats = fid_lib.calculate_stats(
        rng.rand(64, 32).astype(np.float64))
    out, s = pipe.consolidate_report(report, real_stats)
    # Mean over exactly the 3 appended (non-padded) rows.
    assert abs(out[0]['psnr_avg'] - 20.0) < 1e-6
    assert 'fid_front' in out[0] and np.isfinite(out[0]['fid_front'])
    assert 'fid_front' in s
