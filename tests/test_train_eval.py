"""Smoke test: GAN evaluation path (FID + recon + checkpoint_best gating).

Uses a stub Inception (cheap pooled features) so the full pipeline — real
stats, eval rendering with EMA params, FID computation, best-FID gating,
image/scalar logging — runs in seconds on the CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_from_image_tpu.data.loaders import DatasetSplit
from nerf_from_image_tpu.train import gan as gan_lib
from nerf_from_image_tpu.train.eval import (GANEvaluator,
                                            compute_eval_indices,
                                            compute_view_perm)


def _stub_inception(im):
    # (B, 3, H, W) -> (B, 48) pooled features.
    b = im.shape[0]
    x = im.reshape(b, 3, 4, im.shape[2] // 4, 4, im.shape[3] // 4)
    return x.mean(axis=(3, 5)).reshape(b, -1)


class _Writer:
    def __init__(self):
        self.scalars = {}
        self.images = {}

    def add_scalar(self, tag, value, step):
        self.scalars[tag] = value

    def add_images(self, tag, images, step):
        self.images[tag] = np.asarray(images).shape


def _make_split(n, res, views_per_object=1):
    rng = np.random.RandomState(0)
    pose = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    pose[:, 2, 3] = 4.0
    return DatasetSplit(
        images=rng.uniform(-1, 1, (n, res, res, 4)).astype(np.float32),
        tform_cam2world=pose,
        focal_length=np.full((n,), 1.2, np.float32))


def test_eval_indices_protocol():
    rng = np.random.RandomState(1234)
    idx = compute_eval_indices(10, 'p3d_car', rng)
    np.testing.assert_array_equal(idx, np.arange(10))
    perm = compute_view_perm(idx, 1, rng)
    assert sorted(perm) == list(range(10))
    # Multi-view: permuted index must map to the same object, another view.
    idx = np.arange(12)
    perm = compute_view_perm(idx, 4, np.random.RandomState(0))
    assert all(p // 4 == i // 4 for i, p in zip(idx, perm))
    assert all(p != i for i, p in zip(idx, perm))


@pytest.mark.slow
def test_evaluator_smoke(tmp_path):
    res = 16
    cfg = gan_lib.GANConfig(resolution=res, latent_dim=16,
                            depth_samples_per_ray=4, fine_sampling=False,
                            attention_values=4, batch_size=4,
                            plane_resolution=32)
    gen, _ = gan_lib.make_models(cfg)
    state = jax.jit(lambda k: gan_lib.init_train_state(k, cfg))(
        jax.random.PRNGKey(0))

    split = _make_split(6, res)
    dataset_config = {'views_per_object': 1, 'has_mask': True,
                      'views_per_object_test': None}
    ev = GANEvaluator(cfg, dataset_config, 'p3d_car', split, split, None,
                      inception_apply=_stub_inception,
                      eval_batch_size=4,
                      stats_cache_dir=str(tmp_path))
    writer = _Writer()
    fid, is_best = ev.evaluate(state, 3, gen, writer)
    assert fid is not None and np.isfinite(fid)
    assert is_best  # first eval is always the best so far
    assert 'generation/fid_untrunc' in writer.scalars
    assert any(t.startswith('img_eval_gen/') for t in writer.images)
    # Stats were cached to disk.
    assert list(tmp_path.glob('fid_stats_*.npz'))

    # Second eval with identical params: FID equal, not better.
    fid2, is_best2 = ev.evaluate(state, 4998, gen, writer)
    assert not is_best2
    np.testing.assert_allclose(fid, fid2, rtol=1e-4)

    ev.log_training_images(state, 3, gen, writer, np.random.RandomState(0))
    assert 'img/rgb' in writer.images and 'img/inference' in writer.images
