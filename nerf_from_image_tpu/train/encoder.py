"""Bootstrap-encoder distillation: train SegFormer on GAN-rendered pairs.

Parity with /root/reference/run.py:1521-1706: each step samples a latent,
renders image + mask + canonical coords from the frozen EMA generator, and
supervises the encoder with masked-L2 coords + L1 mask + MSE latent
losses. One jitted step; GAN params are closed over with stop_gradient
(the reference's no_grad render).

Schedule: 120k iters, Adam lr 6e-5, /10 at 60k (run.py:1570, 1616,
1689-1694).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from nerf_from_image_tpu.models.encoder import BootstrapEncoder
from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.render import render

MAX_ITERS = 120000
LR = 6e-5


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    resolution: int = 128
    latent_dim: int = 512
    depth_samples_per_ray: int = 64
    fine_sampling: bool = True
    scene_range: float = 0.55
    white_background: bool = True
    max_iters: int = MAX_ITERS


@flax.struct.dataclass
class EncoderTrainState:
    params: Any
    opt_state: Any
    iteration: jnp.ndarray
    rng: jax.Array


def lr_schedule(count):
    """lr / 10 at 50% of the schedule (run.py:1689-1694)."""
    return jnp.where(count < MAX_ITERS // 2, LR, LR / 10.0)


def make_optimizer():
    return optax.adam(lr_schedule)


def init_train_state(rng: jax.Array, encoder: BootstrapEncoder,
                     cfg: EncoderConfig) -> EncoderTrainState:
    rng, k = jax.random.split(rng)
    x = jnp.zeros((1, 3, cfg.resolution, cfg.resolution))
    params = encoder.init(k, x)
    opt = make_optimizer()
    return EncoderTrainState(params=params, opt_state=opt.init(params),
                             iteration=jnp.zeros((), jnp.int32), rng=rng)


def render_distillation_targets(gen: Generator, ema_params, z, pose, focal,
                                center, bbox, cfg: EncoderConfig, rng,
                                noise=None):
    """Frozen-EMA render of (image, mask, canonical coords)
    (run.py:1630-1647).

    `noise`: optional dict of precomputed noise arrays replacing the
    rng-derived draws (trajectory-parity injection, same contract as
    train/gan.py:generator_forward): 'depth'/'pdf_u' for the renderer,
    'sg_noise' for per-layer StyleGAN noise."""
    rng, rng_sgnoise = jax.random.split(rng)
    if noise is not None and 'sg_noise' in noise:
        rng_sgnoise = noise['sg_noise']
    ws = gen.apply(ema_params, z, method=Generator.map)
    # Fresh StyleGAN noise per distillation render for noise-enabled models
    # (reference run.py:1639-1647 renders with default noise_mode='random').
    state = gen.apply(ema_params, ws, noise_rng=rng_sgnoise,
                      method=Generator.synthesize)

    def sample_fn(pts, reqs):
        return gen.apply(ema_params, state, pts, reqs,
                         method=Generator.sample)

    render_rng = rng
    if noise is not None and ('depth' in noise or 'pdf_u' in noise):
        render_rng = {k: noise[k] for k in ('depth', 'pdf_u') if k in noise}
    out = render(sample_fn, cfg.resolution, cfg.resolution, pose, focal,
                 center, bbox, cfg.scene_range, cfg.white_background,
                 cfg.depth_samples_per_ray, rng=render_rng,
                 fine_sampling=cfg.fine_sampling, compute_coords=True)
    image = jnp.clip(out.rgb, -1.0, 1.0)
    return (jax.lax.stop_gradient(image), jax.lax.stop_gradient(out.mask),
            jax.lax.stop_gradient(out.semantics),  # = coords (run.py:337)
            jax.lax.stop_gradient(ws))


def train_step(state: EncoderTrainState, batch: Dict[str, jnp.ndarray],
               encoder: BootstrapEncoder, gen: Generator, ema_params,
               opt, cfg: EncoderConfig
               ) -> Tuple[EncoderTrainState, Dict[str, jnp.ndarray]]:
    """One distillation step. batch: pose/focal/center/bbox (+z and
    'noise' optional — trajectory-parity injections)."""
    rng, rng_z, rng_render, rng_dp = jax.random.split(state.rng, 4)
    z = batch.get('z')
    if z is None:
        z = jax.random.normal(rng_z, (batch['pose'].shape[0],
                                      cfg.latent_dim))

    target_img, target_mask, target_coords, ws = \
        render_distillation_targets(gen, ema_params, z, batch['pose'],
                                    batch.get('focal'), batch.get('center'),
                                    batch.get('bbox'), cfg, rng_render,
                                    noise=batch.get('noise'))

    def loss_fn(params):
        # train() mode: stochastic depth active (the reference trains the
        # regressor with SegFormer's default drop_path_rate=0.1,
        # run.py:1619 coord_regressor.train(); segformer.py:24-37).
        coords, seg, w = encoder.apply(params,
                                       target_img.transpose(0, 3, 1, 2),
                                       deterministic=False,
                                       rngs={'droppath': rng_dp})
        loss_coords = jnp.mean(
            jnp.linalg.norm(coords - target_coords, axis=-1) * target_mask)
        loss_mask = jnp.mean(jnp.abs(seg - target_mask))
        loss_latent = jnp.mean(jnp.square(w - ws[:, :1]))
        loss = loss_coords + loss_mask + loss_latent
        return loss, {'loss_coords': loss_coords, 'loss_mask': loss_mask,
                      'loss_latent': loss_latent}

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, opt_state=opt_state, rng=rng,
                         iteration=state.iteration + 1), metrics
