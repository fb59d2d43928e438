"""Hybrid-inversion refinement: latent + pose Adam loop as one lax.scan.

TPU-first re-design of the reference's per-step Python loop
(/root/reference/run.py:1986-2317): the ~30 Adam steps over
[w, z0, R, s, t2] compile to a single jitted `lax.scan`, so a whole batch
of images is inverted in one device program (the BASELINE.json north-star
formulation). Includes the z-gain trick (w stored divided by gain so
Adam's effective lr on it is gain x), per-step projections (R
re-normalized, z0 clamped to +-4, s -> |s|), and the reference losses
(VGG-LPIPS with 15 random-affine crops / l1 / mse / mixed).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from nerf_from_image_tpu.core import augment as augment_lib
from nerf_from_image_tpu.core import pose as pose_utils
from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.models.lpips import LPIPS
from nerf_from_image_tpu.render import render


@flax.struct.dataclass
class InversionParams:
    """Optimizable inversion state. z is stored pre-gain (w = z * gain)."""
    z: jnp.ndarray  # (B, num_ws or 1, 512)
    R: jnp.ndarray  # (B, 4) quaternion
    s: jnp.ndarray  # (B,)
    t2: jnp.ndarray  # (B, 2)
    z0: Optional[jnp.ndarray] = None  # (B,) perspective only


import dataclasses


@dataclasses.dataclass(frozen=True)
class InversionConfig:
    """Static inversion configuration (closed over by the jitted loop)."""
    resolution: int = 128
    depth_samples_per_ray: int = 64
    fine_sampling: bool = True
    ray_multiplier: int = 1  # 4 when fine sampling is off (run.py:2271)
    scene_range: float = 0.55
    white_background: bool = True
    camera_flipped: bool = False
    lr_gain_z: float = 5.0
    loss_type: str = 'vgg'  # vgg | vgg_nocrop | l1 | mse | mixed
    num_augmentations: int = 15
    optimize_pose: bool = True
    lr: float = 2e-3
    # Route the 15-crop LPIPS augment through the windowed Pallas warp
    # (ops/pallas/warp.py) instead of XLA gather/scatter. Same sampled
    # transforms; crop values are bf16-rounded. Set where the generator
    # itself runs the pallas sampler (TPU).
    use_pallas_warp: bool = False


def make_camera(params: InversionParams, camera_flipped: bool):
    r = params.R / jnp.linalg.norm(params.R, axis=-1, keepdims=True)
    return pose_utils.pose_to_matrix(params.z0, params.t2, params.s, r,
                                     camera_flipped)


def render_from_params(gen: Generator, gen_vars, params: InversionParams,
                       cfg: InversionConfig, center=None, bbox=None,
                       compute_normals=False, compute_semantics=False,
                       override_cam=None, ray_sharding=None,
                       noise_rng=None, render_rng=None):
    """noise_rng: per-step StyleGAN noise key for noise-enabled models
    (cub/imagenet_elephant). The refinement loss passes one (the reference
    re-rolls noise every forward); the jitted bookend/demo renders pass
    None, which resolves to the deterministic 'const' noise buffer — a
    documented deviation from the reference's stochastic eval renders.

    render_rng: optional rng for the depth-sampling randomness — either a
    PRNG key or a precomputed-noise dict {'depth', 'pdf_u'} (see
    render()). The reference renders with randomize=True everywhere
    (run.py:185, 2272); None keeps the rebuild's deterministic default,
    the dict form is used for reference-trajectory replay."""
    cam, focal = make_camera(params, cfg.camera_flipped)
    if override_cam is not None:
        cam = override_cam
    ws = params.z * cfg.lr_gain_z
    if ws.shape[1] == 1:
        num_ws = 14 + (1 if gen.attention_values > 0 else 0)
        ws = jnp.broadcast_to(ws, (ws.shape[0], num_ws, ws.shape[-1]))
    state = gen.apply(gen_vars, ws, noise_rng=noise_rng,
                      method=Generator.synthesize)

    def sample_fn(pts, reqs):
        return gen.apply(gen_vars, state, pts, reqs, method=Generator.sample)

    out = render(sample_fn, cfg.resolution, cfg.resolution, cam, focal,
                 center, bbox, cfg.scene_range, cfg.white_background,
                 cfg.depth_samples_per_ray * cfg.ray_multiplier,
                 rng=render_rng,
                 fine_sampling=cfg.fine_sampling,
                 compute_normals=compute_normals,
                 compute_semantics=compute_semantics,
                 ray_sharding=ray_sharding)
    return out, cam, focal


def inversion_loss(gen: Generator, gen_vars, lpips: LPIPS, lpips_vars,
                   params: InversionParams, target_img: jnp.ndarray,
                   cfg: InversionConfig, rng: jax.Array, injected=None):
    """Loss of run.py:2202-2254. target_img: (B, H, W, 3+) in [-1, 1].

    injected: optional per-step noise for reference-trajectory replay —
    {'render': {'depth', 'pdf_u'}, 'tform': AffineTransform} replaces the
    rng-derived depth sampling / crop-augment randomness with the
    reference's recorded draws."""
    injected = injected or {}
    rng, rng_sgnoise = jax.random.split(rng)
    out, cam, focal = render_from_params(
        gen, gen_vars, params, cfg, noise_rng=rng_sgnoise,
        render_rng=injected.get('render'))
    pred = out.rgb  # (B, H, W, 3)
    target = target_img[..., :3]

    loss = 0.0
    if cfg.loss_type in ('vgg', 'vgg_nocrop', 'mixed'):
        pred_nchw = pred.transpose(0, 3, 1, 2)
        target_nchw = target.transpose(0, 3, 1, 2)
        n_aug = 0 if cfg.loss_type == 'vgg_nocrop' else cfg.num_augmentations
        if n_aug > 0:
            b = pred.shape[0]
            h, w = pred.shape[1], pred.shape[2]
            if cfg.use_pallas_warp:
                # TPU path: one 6-channel windowed-kernel warp (MXU
                # one-hot bilinear) for pred+target. The grid is data,
                # so the backward is the kernel's planes-only window
                # scatter-accumulate — no XLA scatter (index-bound,
                # ~260 ms/step at batch 8). Same sampled transforms as
                # the XLA path (identical sample_transform call).
                from nerf_from_image_tpu.ops.pallas import warp as warp_lib
                tform = injected.get('tform')
                if tform is None:
                    tform = augment_lib.sample_transform(rng, b * n_aug, 1.0)
                grid = augment_lib.image_warp_grid(tform, h, w).reshape(
                    b, n_aug, h, w, 2)
                stacked = jnp.concatenate(
                    (pred_nchw, jax.lax.stop_gradient(target_nchw)),
                    axis=1)
                if cfg.white_background:
                    stacked = stacked - 1.0
                out = warp_lib.grid_sample_zeros_windowed(stacked, grid)
                if cfg.white_background:
                    out = out + 1.0
                pred_aug = out[:, :, :3].reshape(b * n_aug, 3, h, w)
                target_aug = jax.lax.stop_gradient(
                    out[:, :, 3:].reshape(b * n_aug, 3, h, w))
            else:
                # Two augment calls with the SAME rng (identical sampled
                # transforms) instead of one 6-channel call: the target
                # copy is fully stop-gradient'd, so its warp backward —
                # an XLA scatter, by far the most expensive op in the
                # step — is dead-code-eliminated. Measured: halves the
                # ~520 ms/step augment backward.
                pred_rep = jnp.repeat(pred_nchw, n_aug, axis=0)
                target_rep = jax.lax.stop_gradient(
                    jnp.repeat(target_nchw, n_aug, axis=0))
                pred_aug, _, _, tform = augment_lib.augment(
                    rng, pred_rep, None, None, 1.0,
                    white_background=cfg.white_background,
                    cached_tform=injected.get('tform'))
                # Reuse the first call's sampled transform explicitly so
                # pred/target warps stay aligned even if transform
                # sampling ever becomes input-dependent (ADVICE r1).
                target_aug, _, _, _ = augment_lib.augment(
                    rng, target_rep, None, None, 1.0,
                    white_background=cfg.white_background,
                    cached_tform=tform)
                target_aug = jax.lax.stop_gradient(target_aug)
            pred_all = jnp.concatenate((pred_nchw, pred_aug), axis=0)
            target_all = jnp.concatenate((target_nchw, target_aug), axis=0)
        else:
            pred_all, target_all = pred_nchw, target_nchw
        lp = lpips.apply(lpips_vars, pred_all, target_all)
        # Disjoint samples: sum over batch (run.py:2232-2235).
        loss = loss + jnp.mean(lp) * pred.shape[0]
        # The first B rows of pred_all/target_all are the un-augmented
        # pair, so the reference's lpips_monitor (run.py:2249-2252) is
        # free here.
        lpips_monitor = jax.lax.stop_gradient(
            jnp.mean(lp.reshape(-1)[:pred.shape[0]]))
    else:
        lpips_monitor = jax.lax.stop_gradient(jnp.mean(
            lpips.apply(lpips_vars, pred.transpose(0, 3, 1, 2),
                        target.transpose(0, 3, 1, 2))))
    if cfg.loss_type in ('l1', 'mixed'):
        loss = loss + jnp.mean(jnp.abs(pred - target)) * pred.shape[0]
    if cfg.loss_type == 'mse':
        loss = jnp.mean(jnp.square(pred - target)) * pred.shape[0]
    if cfg.loss_type == 'mixed':
        loss = loss / 2.0

    # The reference monitor clamps both operands to [0, 1] and caps each
    # sample at 60 dB (lib/metrics.py:30-44).
    p01 = jnp.clip(pred / 2.0 + 0.5, 0.0, 1.0)
    t01 = jnp.clip(target / 2.0 + 0.5, 0.0, 1.0)
    monitor = {
        'psnr': jnp.minimum(-10.0 * jnp.log10(
            jnp.mean(jnp.square(p01 - t01), axis=(1, 2, 3))), 60.0),
        'lpips': lpips_monitor,
        'cam': jax.lax.stop_gradient(cam),
    }
    return loss, monitor


def make_inversion_step(gen: Generator, gen_vars, lpips: LPIPS, lpips_vars,
                        cfg: InversionConfig, gt_cam2world=None):
    opt = optax.adam(cfg.lr, b1=0.9, b2=0.95)

    def project(params: InversionParams) -> InversionParams:
        r = params.R / jnp.linalg.norm(params.R, axis=-1, keepdims=True)
        new = params.replace(R=r, s=jnp.abs(params.s))
        if params.z0 is not None:
            new = new.replace(z0=jnp.clip(params.z0, -4.0, 4.0))
        return new

    def step(carry, xs):
        params, opt_state, target = carry
        rng, injected = xs if isinstance(xs, tuple) else (xs, None)

        def loss_fn(p):
            return inversion_loss(gen, gen_vars, lpips, lpips_vars, p,
                                  target, cfg, rng, injected=injected)

        (loss, monitor), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        if not cfg.optimize_pose:
            zero = lambda x: jnp.zeros_like(x) if x is not None else None
            grads = grads.replace(R=zero(grads.R), s=zero(grads.s),
                                  t2=zero(grads.t2),
                                  z0=zero(grads.z0))
        updates, opt_state = opt.update(grads, opt_state, params)
        params = project(optax.apply_updates(params, updates))
        # Per-param grad norms, reference names z/f/R/s/t
        # (run.py:1998-2010, 2299-2304; f = log-focal z0, t = t2).
        norm = lambda g: jnp.sqrt(jnp.sum(jnp.square(g)))
        metrics = {'loss': loss, 'psnr': jnp.mean(monitor['psnr']),
                   'lpips': monitor['lpips'],
                   'grad_norm_z': norm(grads.z),
                   'grad_norm_R': norm(grads.R),
                   'grad_norm_s': norm(grads.s),
                   'grad_norm_t': norm(grads.t2)}
        if grads.z0 is not None:
            metrics['grad_norm_f'] = norm(grads.z0)
        if gt_cam2world is not None:
            metrics['rot_error'] = jnp.mean(
                pose_utils.rotation_matrix_distance(
                    monitor['cam'], gt_cam2world))
        return (params, opt_state, target), metrics

    return opt, step


def run_inversion(gen: Generator, gen_vars, lpips: LPIPS, lpips_vars,
                  init_params: InversionParams, target_img: jnp.ndarray,
                  cfg: InversionConfig, n_steps: int, rng: jax.Array,
                  gt_cam2world=None, injected_noise=None):
    """Full refinement loop as one lax.scan; returns (params, metrics).
    Metrics are per-step stacked scalars (the monitor_b0/* telemetry of
    run.py:2288-2306); rot_error is included when gt_cam2world given.

    injected_noise: optional pytree of per-step noise stacked on a
    leading n_steps axis ({'render': ..., 'tform': ...} per step; see
    inversion_loss) — reference-trajectory replay."""
    opt, step = make_inversion_step(gen, gen_vars, lpips, lpips_vars, cfg,
                                    gt_cam2world=gt_cam2world)
    opt_state = opt.init(init_params)
    rngs = jax.random.split(rng, n_steps)
    xs = rngs if injected_noise is None else (rngs, injected_noise)
    (params, _, _), metrics = jax.lax.scan(
        step, (init_params, opt_state, target_img), xs)
    return params, metrics
