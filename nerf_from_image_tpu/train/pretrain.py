"""SDF pretraining: fit the field to a unit sphere before GAN training.

Parity with /root/reference/run.py:824-868: 1000 Adam steps (default
betas, no warmup) on (distance MSE to ||x|| - 1) + eikonal loss over
stratified volume samples, then EMA <- params. Compiled as a single
lax.scan over steps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.train import gan as gan_lib

PRETRAIN_STEPS = 1000


def pretrain_sdf(state: gan_lib.GANTrainState, cfg: gan_lib.GANConfig,
                 mesh, eikonal_weight: float, lr: float,
                 n_steps: int = PRETRAIN_STEPS,
                 dtype=None, injected: Optional[dict] = None,
                 return_losses: bool = False):
    """Runs the pretrain loop. `injected` (trajectory replay): a dict of
    per-step stacked noise arrays replacing the rng draws — 'z'
    (n_steps, B, latent) latent samples, 'strata' (n_steps, ...) the
    stratified-volume uniform draws, and 'perturb' (n_steps, ...) the
    eikonal perturbation normals (the reference's torch draws at
    run.py:829 / ops.py:25 / generator.py:forward). `return_losses`
    additionally returns the per-step (distance, eikonal) loss trace
    (the reference prints them every 100 steps, run.py:856-862)."""
    gen, _ = gan_lib.make_models(cfg, dtype or jnp.float32)
    opt = optax.adam(lr)

    def one_step(carry, step_in):
        params, opt_state = carry
        rng, inj = step_in
        rng_z, rng_reg, rng_sgnoise = jax.random.split(rng, 3)
        if inj is not None and 'z' in inj:
            z = inj['z']
        else:
            z = jax.random.normal(rng_z, (cfg.batch_size, cfg.latent_dim))
        reg_rng = rng_reg
        if inj is not None and ('strata' in inj or 'perturb' in inj):
            reg_rng = {k: inj[k] for k in ('strata', 'perturb')
                       if k in inj}

        def loss_fn(p):
            ws = gen.apply(p, z, method=Generator.map)
            # noise-enabled models pretrain with fresh noise too
            # (reference pretrain_sdf runs the default 'random' forward).
            planes = gen.apply(p, ws[:, :14] if cfg.attention_values > 0
                               else ws, noise_rng=rng_sgnoise,
                               method=Generator.synthesize_planes)
            losses = gen.apply(p, planes, reg_rng,
                               ('sdf_distance_loss', 'sdf_eikonal_loss'),
                               32, method=Generator.sdf_losses)
            dist = jnp.mean(losses['sdf_distance_loss'])
            eik = jnp.mean(losses['sdf_eikonal_loss'])
            return dist + eikonal_weight * eik, (dist, eik)

        (loss, (dist, eik)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (dist, eik)

    @jax.jit
    def run(params, rng, injected):
        opt_state = opt.init(params)
        rngs = jax.random.split(rng, n_steps)
        (params, _), losses = jax.lax.scan(one_step, (params, opt_state),
                                           (rngs, injected))
        return params, losses

    rng, sub = jax.random.split(state.rng)
    params, losses = run(state.params_g, sub, injected)
    # EMA <- params (run.py:866).
    ema = jax.tree_util.tree_map(lambda x: x, params)
    new_state = state.replace(params_g=params, ema_params_g=ema, rng=rng)
    if return_losses:
        return new_state, losses
    return new_state
