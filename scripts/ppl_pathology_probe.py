"""Probe for the PPL x SDF-eikonal XLA pathology (VERDICT r3 #2).

Times g_step compile+steps at a REDUCED operating point. r4 finding:
the pathology does NOT reproduce at reduced shapes (res 32 narrow:
44.5 s compile, 73 ms steps even fused) — it is memory-pressure-driven
scheduling at the flagship point, not pass complexity. Full findings in
PERF.md "PPL x eikonal pathology"; this probe remains the hermetic CI
canary that the combination compiles and runs finite.

Usage: python scripts/ppl_pathology_probe.py MODE [res] [batch]
  MODE: base       PPL off, eikonal on (known-good control)
        ppl        PPL on,  eikonal on (the flagship-pathological combo)
        ppl_noeik  PPL on,  eikonal off (isolates which 2nd-order graph)
  batch must be >= 4 (minibatch-std group size).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else 'ppl'
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from nerf_from_image_tpu.train import gan as gan_lib

    cfg = gan_lib.GANConfig(
        resolution=res, latent_dim=64, depth_samples_per_ray=16,
        fine_sampling=True, attention_values=4, batch_size=batch,
        plane_resolution=64, use_pallas=False,
        channel_base=4096, channel_max=64,
        use_sdf=(mode != 'ppl_noeik'),
        path_length_regularization=mode.startswith('ppl'))
    gen, disc = gan_lib.make_models(cfg)
    opt_g, _ = gan_lib.make_optimizers(cfg)
    state = jax.jit(lambda k: gan_lib.init_train_state(k, cfg))(
        jax.random.PRNGKey(0))

    pose = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4)).at[:, 2, 3].set(4.0)
    bg = {'pose': pose, 'focal': jnp.full((batch,), 1.2),
          'z': jax.random.normal(jax.random.PRNGKey(1),
                                 (batch, cfg.latent_dim))}

    g_step = jax.jit(lambda s, b: gan_lib.g_step(s, b, gen, disc, opt_g,
                                                 cfg))
    t0 = time.time()
    lowered = g_step.lower(state, bg)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    s2, m = compiled(state, bg)
    np.asarray(m['loss_g'])
    t_step1 = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        s2, m = compiled(s2, bg)
    np.asarray(m['loss_g'])
    t_step = (time.time() - t0) / 3
    print(f'{mode} res={res} b={batch}: lower {t_lower:.1f}s, '
          f'compile {t_compile:.1f}s, step1 {t_step1:.2f}s, '
          f'step {t_step * 1e3:.0f} ms', flush=True)


if __name__ == '__main__':
    main()
