"""End-to-end GAN loop smoke: a few alternating G/D iterations with eval
+ checkpointing on the CPU mesh (tiny shapes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_from_image_tpu.data.loaders import DatasetSplit
from nerf_from_image_tpu.parallel import create_mesh, replicate
from nerf_from_image_tpu.train import gan as gan_lib
from nerf_from_image_tpu.train import loop as loop_lib


class _Ckpt:
    def __init__(self):
        self.saved = []

    def save(self, tree, label, host_state=None):
        self.saved.append(label)


@pytest.mark.slow
def test_train_gan_loop_smoke(tmp_path):
    cfg = gan_lib.GANConfig(resolution=16, latent_dim=16,
                            depth_samples_per_ray=4, fine_sampling=False,
                            attention_values=4, batch_size=8,
                            plane_resolution=32, use_pallas=False)
    state = jax.jit(lambda k: gan_lib.init_train_state(k, cfg))(
        jax.random.PRNGKey(0))
    mesh = create_mesh()
    state = replicate(state, mesh)

    rng = np.random.RandomState(0)
    pose = np.tile(np.eye(4, dtype=np.float32), (12, 1, 1))
    pose[:, 2, 3] = 4.0
    split = DatasetSplit(
        images=rng.uniform(-1, 1, (12, 16, 16, 3)).astype(np.float32),
        tform_cam2world=pose,
        focal_length=np.full((12,), 1.2, np.float32))

    evals = []

    def eval_fn(s, i):
        evals.append(i)
        return 10.0, i == 3  # pretend iteration 3 is the best

    ckpt = _Ckpt()
    loop_lib.DISPLAY_EVERY_BAK = loop_lib.DISPLAY_EVERY
    loop_lib.DISPLAY_EVERY = 6
    try:
        state = loop_lib.train_gan(state, cfg, split, mesh, num_iters=8,
                                   ckpt_manager=ckpt, eval_fn=eval_fn)
    finally:
        loop_lib.DISPLAY_EVERY = loop_lib.DISPLAY_EVERY_BAK
    assert int(state.iteration) == 8
    # eval at the iteration-3 smoke point and at (i+1) % 6 == 0 (i=5).
    assert evals == [3, 5]
    assert 'best' in ckpt.saved and ckpt.saved.count('latest') == 2


@pytest.mark.slow
def test_train_gan_resume_bit_exact(tmp_path):
    """Checkpoint at the iteration-3 smoke save, resume, and reproduce the
    EXACT same final state: host RNG, sampler order, and host key are all
    part of the checkpoint (run.py:1474-1516, lib/utils.py:87-113)."""
    from nerf_from_image_tpu.utils import checkpoint as ckpt_lib

    cfg = gan_lib.GANConfig(resolution=16, latent_dim=16,
                            depth_samples_per_ray=4, fine_sampling=False,
                            attention_values=4, batch_size=8,
                            plane_resolution=32, use_pallas=False)
    mesh = create_mesh()
    rng = np.random.RandomState(0)
    pose = np.tile(np.eye(4, dtype=np.float32), (12, 1, 1))
    pose[:, 2, 3] = 4.0
    split = DatasetSplit(
        images=rng.uniform(-1, 1, (12, 16, 16, 3)).astype(np.float32),
        tform_cam2world=pose,
        focal_length=np.full((12,), 1.2, np.float32))

    def fresh_state():
        s = jax.jit(lambda k: gan_lib.init_train_state(k, cfg))(
            jax.random.PRNGKey(0))
        return replicate(s, mesh)

    ckpt = ckpt_lib.CheckpointManager(str(tmp_path / 'ckpt'))
    # Run A: train 0 -> 8 (checkpoints at the i==3 smoke point).
    state_a = loop_lib.train_gan(
        fresh_state(), cfg, split, mesh, num_iters=8, ckpt_manager=ckpt,
        eval_fn=lambda s, i: (float(10 + i), False),
        host_state_extra=lambda: {'best_fid': 7.25})
    assert ckpt.exists('latest')

    # Run B: restore the i==3 checkpoint (+ host state) and train to 8.
    state_b = ckpt.restore(fresh_state(), 'latest')
    hs = ckpt.restore_host_state('latest')
    assert hs is not None and float(hs['best_fid']) == 7.25
    assert int(state_b.iteration) == 4
    state_b = loop_lib.train_gan(state_b, cfg, split, mesh, num_iters=8,
                                 host_state=hs)

    flat_a = jax.tree_util.tree_leaves(
        (state_a.params_g, state_a.params_d, state_a.ema_params_g,
         state_a.rng, state_a.augment_p))
    flat_b = jax.tree_util.tree_leaves(
        (state_b.params_g, state_b.params_d, state_b.ema_params_g,
         state_b.rng, state_b.augment_p))
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
