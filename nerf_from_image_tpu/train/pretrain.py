"""SDF pretraining: fit the field to a unit sphere before GAN training.

Parity with /root/reference/run.py:824-868: 1000 Adam steps on
(distance MSE to ||x|| - 1) + eikonal loss over stratified volume samples,
then EMA <- params. Compiled as a single lax.scan over steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.train import gan as gan_lib

PRETRAIN_STEPS = 1000


def pretrain_sdf(state: gan_lib.GANTrainState, cfg: gan_lib.GANConfig,
                 mesh, eikonal_weight: float, lr: float,
                 n_steps: int = PRETRAIN_STEPS,
                 dtype=None) -> gan_lib.GANTrainState:
    gen, _ = gan_lib.make_models(cfg, dtype or jnp.float32)
    opt = optax.adam(lr)

    def one_step(carry, rng):
        params, opt_state = carry
        rng_z, rng_reg, rng_sgnoise = jax.random.split(rng, 3)
        z = jax.random.normal(rng_z, (cfg.batch_size, cfg.latent_dim))

        def loss_fn(p):
            ws = gen.apply(p, z, method=Generator.map)
            # noise-enabled models pretrain with fresh noise too
            # (reference pretrain_sdf runs the default 'random' forward).
            planes = gen.apply(p, ws[:, :14] if cfg.attention_values > 0
                               else ws, noise_rng=rng_sgnoise,
                               method=Generator.synthesize_planes)
            losses = gen.apply(p, planes, rng_reg,
                               ('sdf_distance_loss', 'sdf_eikonal_loss'),
                               32, method=Generator.sdf_losses)
            loss = jnp.mean(losses['sdf_distance_loss']) + \
                eikonal_weight * jnp.mean(losses['sdf_eikonal_loss'])
            return loss, losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def run(params, rng):
        opt_state = opt.init(params)
        rngs = jax.random.split(rng, n_steps)
        (params, _), losses = jax.lax.scan(one_step, (params, opt_state),
                                           rngs)
        return params, losses

    rng, sub = jax.random.split(state.rng)
    params, losses = run(state.params_g, sub)
    # EMA <- params (run.py:866).
    ema = jax.tree_util.tree_map(lambda x: x, params)
    return state.replace(params_g=params, ema_params_g=ema, rng=rng)
