"""End-to-end GAN train-loop smoke on the real accelerator.

Runs the FULL host loop (train/loop.py) at the flagship operating point
(128^2, batch 8, bf16, pallas sampler) on a synthetic DatasetSplit for a
handful of iterations, with the REAL GANEvaluator wired in — so the
iteration-3 early-OOM smoke eval (reference run.py:1195-1197) exercises
real-data Inception stats, FID, recon metrics, image logging, and
checkpoint_best on actual hardware.

Run: python scripts/smoke_train_tpu.py [iters]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from nerf_from_image_tpu.data.loaders import DatasetSplit
    from nerf_from_image_tpu.models.inception import InceptionV3FID
    from nerf_from_image_tpu.parallel import mesh as mesh_lib
    from nerf_from_image_tpu.train import gan as gan_lib
    from nerf_from_image_tpu.train import loop as loop_lib
    from nerf_from_image_tpu.train.eval import GANEvaluator
    from nerf_from_image_tpu.utils import checkpoint as ckpt_lib

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    res, bs, n = 128, 8, 32
    dtype = jnp.bfloat16

    cfg = gan_lib.GANConfig(resolution=res, batch_size=bs, use_pallas=True)
    mesh = mesh_lib.create_mesh()
    state = jax.jit(lambda k: gan_lib.init_train_state(
        k, cfg, dtype=dtype))(jax.random.PRNGKey(0))
    state = mesh_lib.replicate(state, mesh)

    rng = np.random.RandomState(0)
    pose = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    pose[:, 2, 3] = 2.0
    split = DatasetSplit(
        images=rng.uniform(-1, 1, (n, res, res, 3)).astype(np.float32),
        tform_cam2world=pose,
        focal_length=np.full((n,), 1.2, np.float32))

    dataset_config = {'scene_range': cfg.scene_range,
                      'white_background': True, 'camera_flipped': False,
                      'views_per_object': None}
    inc = InceptionV3FID()
    inc_vars = inc.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 64, 64)))
    _inc_jit = jax.jit(inc.apply)  # vars as runtime arg, not a baked const
    inception_apply = lambda im: _inc_jit(inc_vars, im)

    gen, _ = gan_lib.make_models(cfg, dtype)
    evaluator = GANEvaluator(cfg, dataset_config, 'smoke', split, split,
                             inception_apply=inception_apply,
                             eval_batch_size=bs)
    evals = []

    def eval_fn(s, i):
        t0 = time.time()
        fid, is_best = evaluator.evaluate(s, i, gen, None)
        evals.append((i, fid))
        print(f'[eval @ {i}] fid={fid} best={is_best} '
              f'({time.time() - t0:.1f}s)', flush=True)
        return fid, is_best

    ckpt_dir = tempfile.mkdtemp(prefix='smoke_ckpt_')
    ckpt = ckpt_lib.CheckpointManager(ckpt_dir)

    t0 = time.time()
    state = loop_lib.train_gan(state, cfg, split, mesh, num_iters=iters,
                               ckpt_manager=ckpt, eval_fn=eval_fn,
                               log_every=2, dtype=dtype)
    dt = time.time() - t0
    assert int(state.iteration) == iters, int(state.iteration)
    assert evals and evals[0][0] == 3, evals
    print(f'SMOKE OK: {iters} iterations in {dt:.1f}s '
          f'({iters * bs / dt:.2f} im/s incl. eval+compile), '
          f'evals at {[e[0] for e in evals]}, '
          f'fid={evals[0][1]:.1f}', flush=True)


if __name__ == '__main__':
    main()
