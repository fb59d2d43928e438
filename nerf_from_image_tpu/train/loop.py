"""GAN training loop: host-side orchestration of the jitted G/D steps.

Mirrors the reference loop structure (/root/reference/run.py:947-1518):
alternating G/D iterations, lazy R1 on every other D step, the iteration-3
early-OOM smoke eval, FID/PSNR eval + checkpointing every 5000 iterations,
and im/s telemetry. Device work is the two compiled step functions;
batches are assembled on host from the preloaded splits and sharded over
the 'data' mesh axis.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.core import augment as augment_lib
from nerf_from_image_tpu.parallel import mesh as mesh_lib
from nerf_from_image_tpu.train import gan as gan_lib
from nerf_from_image_tpu.utils.io import EndlessSampler

DISPLAY_EVERY = 5000


def sample_batch(train_split, batch_size: int, rng: np.random.RandomState,
                 cfg, train_sampler: Optional[EndlessSampler] = None,
                 latent_rng: Optional[jax.Array] = None,
                 augment_p: float = 0.0, augment_rng=None,
                 is_highres: bool = False):
    """Host-side batch assembly (run.py:908-944).

    ADA augmentation of real images runs on device inside the D step when
    `augment_p > 0` (the reference augments on host per batch; here the
    transform is sampled on device from the train-state RNG).
    """
    if train_sampler is not None:
        idx = train_sampler(batch_size)
    else:
        idx = rng.randint(train_split.images.shape[0], size=(batch_size,))

    batch = {
        'image': jnp.asarray(train_split.images[idx]),
        'pose': jnp.asarray(train_split.tform_cam2world[idx]),
    }
    if train_split.focal_length is not None:
        batch['focal'] = jnp.asarray(train_split.focal_length[idx])
    if train_split.bbox is not None:
        batch['bbox'] = jnp.asarray(train_split.bbox[idx])
    if train_split.center is not None:
        batch['center'] = jnp.asarray(train_split.center[idx])
    if getattr(train_split, 'classes', None) is not None:
        batch['class'] = jnp.asarray(train_split.classes[idx])
    if is_highres and train_split.images_highres is not None:
        batch['image_highres'] = jnp.asarray(train_split.images_highres[idx])
    if latent_rng is not None:
        batch['z'] = jax.random.normal(
            latent_rng, (batch_size, cfg.latent_dim))
    return idx, batch


def train_gan(state: gan_lib.GANTrainState, cfg: gan_lib.GANConfig,
              train_split, mesh, num_iters: int,
              writer=None, ckpt_manager=None, eval_fn=None,
              log_every: int = 100, seed: int = 1234,
              profile_trace_at: int = 0, trace_dir: str = '',
              dtype=None):
    """Runs GAN training from state.iteration to num_iters. `dtype` is
    the COMPUTE dtype of the models (params stay f32); None -> f32."""
    import jax.numpy as _jnp
    dtype = dtype or _jnp.float32
    gen, disc = gan_lib.make_models(cfg, dtype)
    disc2 = gan_lib.make_second_discriminator(cfg, dtype)
    opt_g, opt_d = gan_lib.make_optimizers(cfg)

    rng_np = np.random.RandomState(seed)
    train_sampler = EndlessSampler(len(train_split.images), rng_np)
    host_key = jax.random.PRNGKey(seed + 1)

    dual = cfg.dual_discriminator
    g_step = jax.jit(lambda s, b, b2=None: gan_lib.g_step(
        s, b, gen, disc, opt_g, cfg, batch2=b2, disc2=disc2))
    d_steps = {}
    for r1 in (False, True):
        for blur in (False, True):
            d_steps[(r1, blur)] = jax.jit(
                lambda s, br, bf, br2=None, bf2=None, r1=r1, blur=blur:
                gan_lib.d_step(
                    s, br, bf, gen, disc, opt_d, cfg, use_r1_now=r1,
                    blur_active=blur, batch2=br2, fake_batch2=bf2,
                    disc2=disc2))

    i = int(state.iteration)
    t1 = time.time()
    elapsed_ips = 0.0
    while i < num_iters:
        host_key, k1, k2, k3 = jax.random.split(host_key, 4)
        if profile_trace_at and i == profile_trace_at and trace_dir:
            from nerf_from_image_tpu.utils import profiling
            trace_ctx = profiling.trace(trace_dir)
        else:
            import contextlib
            trace_ctx = contextlib.nullcontext()
        if i % 2 == 0:
            _, batch = sample_batch(train_split, cfg.batch_size, rng_np,
                                    cfg, latent_rng=k1)
            batch = mesh_lib.shard_batch(batch, mesh)
            b2 = None
            if dual:
                _, b2 = sample_batch(train_split, cfg.batch_size, rng_np,
                                     cfg)
                b2 = mesh_lib.shard_batch(b2, mesh)
            t1 = time.time()
            with trace_ctx:
                state, metrics = g_step(state, batch, b2)
                jax.block_until_ready(metrics)
        else:
            hires = cfg.is_highres and cfg.augment_p_max > 0
            _, real = sample_batch(train_split, cfg.batch_size, rng_np, cfg,
                                   train_sampler=train_sampler,
                                   is_highres=hires)
            _, fake = sample_batch(train_split, cfg.batch_size, rng_np, cfg,
                                   latent_rng=k2)
            real = mesh_lib.shard_batch(real, mesh)
            fake = mesh_lib.shard_batch(fake, mesh)
            real2 = fake2 = None
            if dual:
                _, real2 = sample_batch(train_split, cfg.batch_size, rng_np,
                                        cfg, is_highres=hires)
                _, fake2 = sample_batch(train_split, cfg.batch_size, rng_np,
                                        cfg, latent_rng=k3)
                real2 = mesh_lib.shard_batch(real2, mesh)
                fake2 = mesh_lib.shard_batch(fake2, mesh)
            use_r1 = cfg.r1 > 0 and i % 2 == 1
            blur_active = i < gan_lib.BLUR_WARMUP_ITERS
            state, metrics = d_steps[(use_r1, blur_active)](state, real,
                                                            fake, real2,
                                                            fake2)
            elapsed_ips = cfg.batch_size / max(time.time() - t1, 1e-9)

        if writer is not None and i % log_every == 0:
            for k, v in metrics.items():
                writer.add_scalar(f'loss/{k}', float(v), i)
            writer.add_scalar('img_per_sec', elapsed_ips, i)

        # Early-OOM smoke eval at iteration 3 + periodic eval/checkpoint
        # (run.py:1195-1197, 1474-1516). eval_fn returns (current_fid,
        # is_best); a best FID gates checkpoint_best (run.py:1403-1405,
        # 1511-1513).
        if i == 3 or (i + 1) % DISPLAY_EVERY == 0:
            is_best = False
            if eval_fn is not None:
                _, is_best = eval_fn(state, i)
            if ckpt_manager is not None:
                ckpt_manager.save(state, 'latest')
                if is_best:
                    ckpt_manager.save(state, 'best')
                if (i + 1) % 50000 == 0:
                    ckpt_manager.save(state, f'{i + 1}')
        i += 1

    return state
