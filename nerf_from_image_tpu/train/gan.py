"""GAN training: alternating G/D jitted steps over a data-parallel mesh.

TPU-first re-design of the reference training loop
(/root/reference/run.py:947-1193):

- The G-step and D-step are two pjit-compiled pure functions over a
  `GANTrainState` pytree; params replicated, batch sharded on the 'data'
  mesh axis; XLA inserts the gradient psum (the DataParallel equivalent).
- Lazy R1 (every other D step), progressive blur, TV/entropy/lr/ppl
  warmups, EMA with iteration-dependent decay, ADA probability control,
  and SDF beta/alpha clamping are all expressed in-graph from the
  iteration scalar so there is exactly one compilation per step type
  (+ one blur-free variant after warmup).
- The progressive blur uses a fixed-width masked kernel (static 61 taps,
  values computed in-graph from the iteration) instead of the reference's
  iteration-dependent kernel *size*, which would force ~300 recompiles.
- Minibatch-std groups are computed over the global batch (documented
  divergence from the reference's per-GPU groups; SURVEY §7.3.7).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from nerf_from_image_tpu.core import augment as augment_lib
from nerf_from_image_tpu.core import grids
from nerf_from_image_tpu.models.discriminator import Discriminator
from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.render import render

BLUR_WARMUP_ITERS = 12500
LR_WARMUP_ITERS = 2000
MAX_BLUR_HALF = 30  # static kernel half-width (sigma<=10 -> floor(30)=30)


def gan_loss(logits: jnp.ndarray, target_positive: bool) -> jnp.ndarray:
    """Non-saturating softplus GAN loss (run.py:353-362)."""
    x = -logits if target_positive else logits
    return jnp.mean(jax.nn.softplus(x))


def blur_kernel_dynamic(iteration: jnp.ndarray) -> jnp.ndarray:
    """Fixed-width progressive-blur kernel, values from the iteration scalar.

    Equals the reference kernel (lib/ops.py:42-49) zero-padded to 61 taps;
    when sigma -> 0 it degenerates to a delta (identity blur).
    """
    sigma = jnp.maximum(1.0 - iteration / BLUR_WARMUP_ITERS, 0.0) * 10.0
    size = jnp.floor(sigma * 3.0)
    x = jnp.arange(-MAX_BLUR_HALF, MAX_BLUR_HALF + 1, dtype=jnp.float32)
    active = (jnp.abs(x) <= size) & (size > 0)
    safe_sigma = jnp.maximum(sigma, 1e-8)
    f = jnp.exp2(-jnp.square(x / safe_sigma)) * active
    # Delta kernel when blur inactive.
    delta = (x == 0).astype(jnp.float32)
    f = jnp.where(size > 0, f, delta)
    return f / jnp.sum(f)


def blur_image(img_nchw: jnp.ndarray, iteration: jnp.ndarray,
               white_background: bool) -> jnp.ndarray:
    k = blur_kernel_dynamic(iteration)
    return grids.blur(img_nchw, k, white_background)


@flax.struct.dataclass
class GANTrainState:
    params_g: Any
    params_d: Any
    ema_params_g: Any
    opt_g: Any
    opt_d: Any
    iteration: jnp.ndarray  # scalar int32 (the global i; G even, D odd)
    rng: jax.Array
    augment_p: jnp.ndarray  # scalar f32 (effective ADA probability)
    ppl_running_avg: jnp.ndarray  # scalar f32
    ada_sign_acc: jnp.ndarray  # scalar f32 (unused placeholder for parity)


import dataclasses


@dataclasses.dataclass(frozen=True)
class GANConfig:
    """Static training configuration (closed over by the jitted steps)."""
    resolution: int = 128
    latent_dim: int = 512
    depth_samples_per_ray: int = 64
    fine_sampling: bool = True
    scene_range: float = 0.55
    white_background: bool = True
    camera_flipped: bool = False
    supervise_alpha: bool = False
    conditional_pose: bool = True
    use_sdf: bool = True
    attention_values: int = 10
    use_viewdir: bool = False
    r1: float = 5.0
    tv: float = 0.5
    entropy: float = 0.05
    eikonal: float = 0.1
    path_length_regularization: bool = False
    augment_ada: bool = False
    augment_p_max: float = 0.0
    ada_target: float = 0.6
    clip_gradient_norm: float = 100.0
    lr_g: float = 0.0025
    lr_d: float = 0.002
    batch_size: int = 32
    plane_resolution: int = 256  # StyleGAN synthesis output resolution
    ema_halflife_kimg: float = 10.0  # alpha = 0.5 ** (32 / 10000)


def make_models(cfg: GANConfig, dtype=jnp.float32):
    gen = Generator(latent_dim=cfg.latent_dim, scene_range=cfg.scene_range,
                    attention_values=cfg.attention_values,
                    use_viewdir=cfg.use_viewdir, use_sdf=cfg.use_sdf,
                    img_resolution=cfg.plane_resolution, dtype=dtype)
    disc = Discriminator(resolution=cfg.resolution,
                         nc=4 if cfg.supervise_alpha else 3,
                         camera_flipped=cfg.camera_flipped,
                         conditional_pose=cfg.conditional_pose, dtype=dtype)
    return gen, disc


def _lr_schedule(base_lr: float):
    """Linear warmup from lr/10 to lr over the first 1000 optimizer steps
    (run.py:662-678, 1181-1190: +delta per D iteration for warmup/2 steps)."""
    def sched(count):
        frac = jnp.minimum(count / (LR_WARMUP_ITERS / 2), 1.0)
        return base_lr / 10.0 + (base_lr - base_lr / 10.0) * frac
    return sched


def make_optimizers(cfg: GANConfig):
    opt_g = optax.chain(
        optax.clip_by_global_norm(cfg.clip_gradient_norm),
        optax.adam(_lr_schedule(cfg.lr_g), b1=0.0, b2=0.99),
    )
    opt_d = optax.chain(
        optax.clip_by_global_norm(cfg.clip_gradient_norm),
        optax.adam(_lr_schedule(cfg.lr_d), b1=0.0, b2=0.99),
    )
    return opt_g, opt_d


def init_train_state(rng: jax.Array, cfg: GANConfig,
                     dtype=jnp.float32) -> GANTrainState:
    gen, disc = make_models(cfg, dtype)
    rng, kg, kd = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.latent_dim))
    params_g = gen.init(kg, z)
    img = jnp.zeros((4, 4 if cfg.supervise_alpha else 3, cfg.resolution,
                     cfg.resolution))
    pose = jnp.broadcast_to(jnp.eye(4), (4, 4, 4)).at[:, 2, 3].set(4.0)
    focal = jnp.ones((4,)) * 1.2
    params_d = disc.init(kd, img, pose, None, focal)
    opt_g, opt_d = make_optimizers(cfg)
    return GANTrainState(
        params_g=params_g,
        params_d=params_d,
        ema_params_g=jax.tree_util.tree_map(lambda x: x, params_g),
        opt_g=opt_g.init(params_g),
        opt_d=opt_d.init(params_d),
        iteration=jnp.zeros((), jnp.int32),
        rng=rng,
        augment_p=jnp.zeros(()),
        ppl_running_avg=jnp.asarray(-1.0),  # <0 means "uninitialized"
        ada_sign_acc=jnp.zeros(()),
    )


def _ema_alpha(iteration):
    """EMA decay with early-training acceleration (run.py:365-371)."""
    alpha = 0.5 ** (32.0 / 10000.0)
    power = jnp.where(iteration < 1000, 100.0,
                      jnp.where(iteration < 10000, 10.0, 1.0))
    return alpha ** power


def generator_forward(gen: Generator, params_g, z, pose, focal, center,
                      bbox, cfg: GANConfig, rng, requests=()):
    """Maps z, synthesizes, renders. Returns (RenderOutput, extra dict)."""
    rng_noise, rng_render, rng_reg = jax.random.split(rng, 3)
    ws = gen.apply(params_g, z, method=Generator.map)
    # Viewdirs are produced by the renderer; for viewdir models we render
    # with the normalized ray directions (set below via closure).
    state = gen.apply(params_g, ws, method=Generator.synthesize)

    def sample_fn(pts, reqs):
        return gen.apply(params_g, state, pts, reqs, method=Generator.sample)

    out = render(sample_fn, cfg.resolution, cfg.resolution, pose, focal,
                 center, bbox, cfg.scene_range, cfg.white_background,
                 cfg.depth_samples_per_ray, rng=rng_render,
                 fine_sampling=cfg.fine_sampling)

    extra = {}
    reg_requests = tuple(r for r in requests
                         if r in ('sdf_eikonal_loss', 'sdf_distance_loss',
                                  'total_variation_loss', 'entropy_loss'))
    if reg_requests:
        extra.update(
            gen.apply(params_g, state.planes, rng_reg, reg_requests,
                      method=Generator.sdf_losses))

    if 'path_length' in requests:
        # PPL: norm of d(sum(planes * noise) + sum(att * noise2))/d(ws)
        # (generator.py:484-499) — jax.grad composes, no manual
        # double-backward machinery needed.
        k1, k2 = jax.random.split(rng_noise)

        def pl_target(ws_in):
            st = gen.apply(params_g, ws_in, method=Generator.synthesize)
            noise = jax.random.normal(k1, st.planes.shape) / math.sqrt(
                st.planes.shape[-2] * st.planes.shape[-1])
            total = jnp.sum(st.planes * noise)
            if st.attention_values is not None:
                noise2 = jax.random.normal(k2, st.attention_values.shape)
                total = total + jnp.sum(st.attention_values * noise2)
            return total

        pl_grad = jax.grad(pl_target)(ws)
        ppl = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grad), axis=-1),
                                axis=-1))
        extra['path_length'] = ppl

    return out, extra


def g_step(state: GANTrainState, batch: Dict[str, jnp.ndarray],
           gen: Generator, disc: Discriminator, opt_g,
           cfg: GANConfig) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
    """One generator update (run.py:954-1073). batch: pose/focal/center/bbox.

    `batch['z']` is sampled on host (or pass rng-driven z).
    """
    i = state.iteration
    rng, rng_fwd, rng_aug = jax.random.split(state.rng, 3)

    pose, focal = batch['pose'], batch.get('focal')
    center, bbox = batch.get('center'), batch.get('bbox')

    requests = []
    if cfg.path_length_regularization:
        requests.append('path_length')
    if cfg.use_sdf:
        requests.append('sdf_eikonal_loss')
    if cfg.tv > 0:
        requests.append('total_variation_loss')
    if cfg.entropy > 0:
        requests.append('entropy_loss')

    def loss_fn(params_g):
        out, extra = generator_forward(gen, params_g, batch['z'], pose,
                                       focal, center, bbox, cfg, rng_fwd,
                                       tuple(requests))
        rgb = out.rgb
        if cfg.supervise_alpha:
            rgb = jnp.concatenate((rgb, out.mask[..., None]), axis=-1)
        img = rgb.transpose(0, 3, 1, 2)
        logits = disc.apply(state.params_d, img, pose, None, focal)
        loss = gan_loss(logits, True)
        metrics = {'loss_g': loss}

        if cfg.use_sdf:
            eik = jnp.mean(extra['sdf_eikonal_loss'])
            loss = loss + cfg.eikonal * eik
            metrics['loss_eikonal'] = eik
        warm = jnp.minimum(i / BLUR_WARMUP_ITERS, 1.0)
        if cfg.tv > 0:
            tv = jnp.mean(extra['total_variation_loss'])
            loss = loss + cfg.tv * warm * tv
            metrics['loss_tv'] = tv
        if cfg.entropy > 0:
            ent = jnp.mean(extra['entropy_loss'])
            loss = loss + cfg.entropy * warm * ent
            metrics['loss_entropy'] = ent
        ppl_avg = state.ppl_running_avg
        if cfg.path_length_regularization:
            ppl = extra['path_length']
            pl_decay = 0.01
            pl_weight = 2.0 * jnp.minimum(i / LR_WARMUP_ITERS, 1.0)
            avg0 = jnp.where(state.ppl_running_avg < 0, jnp.mean(ppl),
                             state.ppl_running_avg)
            ppl_avg = avg0 * (1 - pl_decay) + jnp.mean(ppl) * pl_decay
            ppl_loss = jnp.mean(jnp.square(ppl - ppl_avg))
            loss = loss + pl_weight * ppl_loss
            metrics['loss_ppl'] = ppl_loss
        return loss, (metrics, ppl_avg)

    (loss, (metrics, ppl_avg)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params_g)
    metrics['grad_norm_g'] = optax.global_norm(grads)

    updates, new_opt_g = opt_g.update(grads, state.opt_g, state.params_g)
    params_g = optax.apply_updates(state.params_g, updates)

    if cfg.use_sdf:
        # Clamp beta/alpha >= 1e-3 (run.py:1069-1071).
        p = params_g['params']
        p = dict(p)
        p['beta'] = jnp.maximum(p['beta'], 1e-3)
        p['alpha'] = jnp.maximum(p['alpha'], 1e-3)
        params_g = {**params_g, 'params': p}

    alpha = _ema_alpha(i)
    ema = jax.tree_util.tree_map(
        lambda e, p: e * alpha + p.astype(e.dtype) * (1 - alpha)
        if jnp.issubdtype(e.dtype, jnp.floating) else p,
        state.ema_params_g, params_g)

    new_state = state.replace(params_g=params_g, opt_g=new_opt_g,
                              ema_params_g=ema, rng=rng,
                              ppl_running_avg=ppl_avg,
                              iteration=i + 1)
    return new_state, metrics


def d_step(state: GANTrainState, batch: Dict[str, jnp.ndarray],
           fake_batch: Dict[str, jnp.ndarray],
           gen: Generator, disc: Discriminator, opt_d, cfg: GANConfig,
           use_r1_now: bool,
           blur_active: bool) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
    """One discriminator update (run.py:1074-1190).

    `batch` is the real-phase data; `fake_batch` supplies fresh poses + z
    for the fake phase. `use_r1_now` / `blur_active` are static (two
    compilations each).
    """
    i = state.iteration
    rng, rng_fake, rng_aug_r, rng_aug_f = jax.random.split(state.rng, 4)

    # Real phase ----------------------------------------------------------
    real_img = batch['image']  # (B, H, W, nc) in [-1, 1]
    real_nchw = real_img.transpose(0, 3, 1, 2)
    if blur_active:
        real_nchw = blur_image(real_nchw, i, cfg.white_background)
    pose_r, focal_r = batch['pose'], batch.get('focal')

    # Fake phase (G frozen) -------------------------------------------------
    pose_f, focal_f = fake_batch['pose'], fake_batch.get('focal')
    out_fake, _ = generator_forward(gen, state.params_g, fake_batch['z'],
                                    pose_f, focal_f, fake_batch.get('center'),
                                    fake_batch.get('bbox'), cfg, rng_fake)
    rgb_fake = out_fake.rgb
    if cfg.supervise_alpha:
        rgb_fake = jnp.concatenate((rgb_fake, out_fake.mask[..., None]),
                                   axis=-1)
    fake_nchw = jax.lax.stop_gradient(rgb_fake.transpose(0, 3, 1, 2))

    def loss_fn(params_d):
        def d_real_logits(img):
            return disc.apply(params_d, img, pose_r, None, focal_r)

        logits_real = d_real_logits(real_nchw)
        loss_real = gan_loss(logits_real, True)

        grad_penalty = 0.0
        if use_r1_now:
            g = jax.grad(lambda im: jnp.sum(d_real_logits(im)))(real_nchw)
            grad_penalty = jnp.mean(
                jnp.sum(jnp.square(g.reshape(g.shape[0], -1)), axis=1))

        logits_fake = disc.apply(params_d, fake_nchw, pose_f, None, focal_f)
        loss_fake = gan_loss(logits_fake, False)

        loss = loss_real + (cfg.r1 / 2.0) * grad_penalty + loss_fake
        metrics = {
            'loss_d_real': loss_real,
            'loss_d_fake': loss_fake,
            'loss_r1': grad_penalty,
            'sign_real': jnp.mean(jnp.sign(logits_real)),
        }
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params_d)
    metrics['grad_norm_d'] = optax.global_norm(grads)

    updates, new_opt_d = opt_d.update(grads, state.opt_d, state.params_d)
    params_d = optax.apply_updates(state.params_d, updates)

    # ADA control every 4 D-steps (run.py:1147-1163).
    augment_p = state.augment_p
    if cfg.augment_ada and cfg.augment_p_max > 0:
        ada_interval = 4
        is_update = (i % (2 * ada_interval)) == (2 * ada_interval - 1)
        ada_rampup = 500000.0
        delta = jnp.sign(metrics['sign_real'] - cfg.ada_target) * (
            cfg.batch_size * ada_interval) / ada_rampup
        new_p = jnp.clip(augment_p + delta, 0.0, cfg.augment_p_max)
        new_p = jnp.where(i < BLUR_WARMUP_ITERS, 0.0, new_p)
        augment_p = jnp.where(is_update, new_p, augment_p)

    new_state = state.replace(params_d=params_d, opt_d=new_opt_d, rng=rng,
                              augment_p=augment_p, iteration=i + 1)
    return new_state, metrics
