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


def metric_tag(key: str, dual: bool) -> str:
    """Maps a step-metrics key to the reference's tensorboard tag
    (run.py:1021-1177). In dual-D mode the FIRST discriminator is the
    conditional one and gets the `_cond` suffix; the second
    (unconditional) one gets the bare tag."""
    fixed = {
        'loss_eikonal': 'loss/eikonal',
        'loss_tv': 'loss/tv',
        'loss_entropy': 'loss/entropy',
        'loss_ppl': 'ppl/loss',
        'grad_norm_g': 'grad_norm/g',
        'grad_norm_d': 'grad_norm/d',
        'grad_norm_d2': 'grad_norm/d2',
        'sign_real': 'augment/sign_real',
        'loss_g': 'loss/g_cond' if dual else 'loss/g',
        'loss_g_uncond': 'loss/g',
        'loss_r1': 'loss/r1_cond' if dual else 'loss/r1',
        'loss_r1_uncond': 'loss/r1',
        'loss_d_real_cond': 'loss/d_real_cond',
        'loss_d_fake_cond': 'loss/d_fake_cond',
        'loss_d_real': 'loss/d_real',
        'loss_d_fake': 'loss/d_fake',
        # TPU-only diagnostic (no reference tag): uncorrected windowed-
        # sampler overflow count for the G render; 0 => exact.
        'overflow_resid': 'debug/overflow_resid',
    }
    return fixed.get(key, f'loss/{key}')


def log_train_scalars(writer, metrics, state, cfg, i: int,
                      elapsed_ips: float) -> None:
    """Writes the step metrics plus the state-derived scalar families the
    reference logs (run.py:1043, 1057-1062, 1170): ppl/running_avg,
    sdf/{alpha,beta}(_ema), augment/p."""
    dual = cfg.dual_discriminator
    for k, v in metrics.items():
        writer.add_scalar(metric_tag(k, dual), float(v), i)
    writer.add_scalar('img_per_sec', elapsed_ips, i)
    if cfg.augment_p_max > 0:
        writer.add_scalar('augment/p', float(state.augment_p), i)
    if cfg.path_length_regularization:
        writer.add_scalar('ppl/running_avg', float(state.ppl_running_avg),
                          i)
    if cfg.use_sdf:
        p = state.params_g['params']
        pe = state.ema_params_g['params']
        writer.add_scalar('sdf/beta', float(p['beta'][0]), i)
        writer.add_scalar('sdf/alpha', float(p['alpha'][0]), i)
        writer.add_scalar('sdf/beta_ema', float(pe['beta'][0]), i)
        writer.add_scalar('sdf/alpha_ema', float(pe['alpha'][0]), i)


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
              dtype=None, host_state=None, host_state_extra=None):
    """Runs GAN training from state.iteration to num_iters. `dtype` is
    the COMPUTE dtype of the models (params stay f32); None -> f32.

    `host_state` (from CheckpointManager.restore_host_state) restores the
    host RNG / batch-sampler / host-key so a resumed run reproduces the
    exact batch order (run.py:1474-1516, lib/utils.py:87-113);
    `host_state_extra` is a callable whose dict is merged into every
    saved host state (e.g. the evaluator's best_fid)."""
    import jax.numpy as _jnp

    from nerf_from_image_tpu.utils import checkpoint as ckpt_lib
    dtype = dtype or _jnp.float32
    gen, disc = gan_lib.make_models(cfg, dtype)
    disc2 = gan_lib.make_second_discriminator(cfg, dtype)
    opt_g, opt_d = gan_lib.make_optimizers(cfg)

    rng_np = np.random.RandomState(seed)
    train_sampler = EndlessSampler(len(train_split.images), rng_np)
    host_key = jax.random.PRNGKey(seed + 1)
    if host_state is not None:
        restored_key = ckpt_lib.apply_host_state(host_state, rng_np,
                                                 train_sampler)
        if restored_key is not None:
            host_key = jnp.asarray(restored_key)

    dual = cfg.dual_discriminator
    # The state is threaded (the old value is dead after each step), so
    # donating it lets XLA alias the params/optimizer/EMA buffers in
    # place instead of double-buffering ~GB of state across the update.
    g_step = jax.jit(lambda s, b, b2=None: gan_lib.g_step(
        s, b, gen, disc, opt_g, cfg, batch2=b2, disc2=disc2),
        donate_argnums=0)
    d_steps = {}
    for r1 in (False, True):
        for blur in (False, True):
            d_steps[(r1, blur)] = jax.jit(
                lambda s, br, bf, br2=None, bf2=None, r1=r1, blur=blur:
                gan_lib.d_step(
                    s, br, bf, gen, disc, opt_d, cfg, use_r1_now=r1,
                    blur_active=blur, batch2=br2, fake_batch2=bf2,
                    disc2=disc2), donate_argnums=0)

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
            log_train_scalars(writer, metrics, state, cfg, i, elapsed_ips)

        # Early-OOM smoke eval at iteration 3 + periodic eval/checkpoint
        # (run.py:1195-1197, 1474-1516). eval_fn returns (current_fid,
        # is_best); a best FID gates checkpoint_best (run.py:1403-1405,
        # 1511-1513).
        if i == 3 or (i + 1) % DISPLAY_EVERY == 0:
            is_best = False
            if eval_fn is not None:
                _, is_best = eval_fn(state, i)
            if ckpt_manager is not None:
                hs = ckpt_lib.pack_host_state(
                    rng_np, train_sampler, host_key,
                    **(host_state_extra() if host_state_extra else {}))
                ckpt_manager.save(state, 'latest', host_state=hs)
                if is_best:
                    ckpt_manager.save(state, 'best', host_state=hs)
                if (i + 1) % 50000 == 0:
                    ckpt_manager.save(state, f'{i + 1}', host_state=hs)
        i += 1

    return state
