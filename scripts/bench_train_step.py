"""Times the jitted G/D train steps at the flagship operating point
(128^2, batch N, 64+64 samples, bf16, pallas sampler) on the real chip.

Usage: python scripts/bench_train_step.py [batch] [--ppl] [--steady]

--steady benchmarks the steady-state operating point: blur warmup over
(blur_active=False, the last 96% of a 300k-iteration run) — the right
comparison point for the reference's training-throughput envelope.

--ppl enables path-length regularization. It is OFF by default because
no reference dataset config enables it (arguments.py:111 is opt-in and
data/loaders.py:90-125 never sets it), and because combining its
double-backward with the SDF eikonal double-backward sends XLA into a
compile/remat pathology (>880 s compiles, ~16 s steps vs ~1 s) — see
PERF.md "PPL x eikonal pathology".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(tree):
    """Value-fetch sync: on the tunnel-attached axon backend,
    block_until_ready returns before remote execution completes —
    reducing to a scalar and fetching its bytes is the reliable fence."""
    np.asarray(sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(tree)))


def main():
    from nerf_from_image_tpu.train import gan as gan_lib

    positional = [a for a in sys.argv[1:] if not a.startswith('--')]
    batch = int(positional[0]) if positional else 8
    cfg = gan_lib.GANConfig(resolution=128, latent_dim=512,
                            depth_samples_per_ray=64, fine_sampling=True,
                            attention_values=4, batch_size=batch,
                            plane_resolution=256, use_pallas=True,
                            path_length_regularization='--ppl' in sys.argv,
                            augment_ada=True, augment_p_max=0.8)
    dtype = jnp.bfloat16
    gen, disc = gan_lib.make_models(cfg, dtype)
    opt_g, opt_d = gan_lib.make_optimizers(cfg)
    # dtype threads into init so the plane DMA layout is built bf16 —
    # without it the windowed sampler silently falls back to the
    # index-bound XLA gather path (~14x slower).
    state = jax.jit(lambda k: gan_lib.init_train_state(k, cfg,
                                                       dtype=dtype))(
        jax.random.PRNGKey(0))

    # Camera distance: 2.0 is the representative training operating
    # point (object ~42 px of 128 — conservative vs the frame-filling
    # bbox-cropped reference datasets). 4.0 is an off-distribution
    # zoom-out past the windowed sampler's overflow cliff (object
    # ~21 px, ~7% of blocks overflow) — keep it reachable for
    # regression probing. See PERF.md "r5: the bench-camera overflow
    # cliff".
    dist = 2.0
    for a in sys.argv[1:]:
        if a.startswith('--dist='):
            dist = float(a.split('=')[1])

    def make_batch(key, with_image):
        pose = jnp.broadcast_to(jnp.eye(4),
                                (batch, 4, 4)).at[:, 2, 3].set(dist)
        out = {'pose': pose, 'focal': jnp.full((batch,), 1.2),
               'z': jax.random.normal(key, (batch, cfg.latent_dim))}
        if with_image:
            out['image'] = jax.random.uniform(
                key, (batch, cfg.resolution, cfg.resolution, 3),
                minval=-1.0, maxval=1.0)
        return out

    g_step = jax.jit(lambda s, b: gan_lib.g_step(s, b, gen, disc, opt_g,
                                                 cfg))
    # A/B the first-order-regularizer decode routing (--ab-reg): the
    # same step with the tv/entropy/distance decodes on the XLA
    # quad-table path instead of the windowed Pallas sampler.
    g_step_xla_reg = None
    if '--ab-reg' in sys.argv:
        import dataclasses
        cfg_xla = dataclasses.replace(cfg, reg_windowed=False)
        g_step_xla_reg = jax.jit(lambda s, b: gan_lib.g_step(
            s, b, gen, disc, opt_g, cfg_xla))
    d_step = jax.jit(lambda s, br, bf: gan_lib.d_step(
        s, br, bf, gen, disc, opt_d, cfg, use_r1_now=True,
        blur_active='--steady' not in sys.argv))
    # The reference applies R1 only every 2nd D step (run.py:1095-1100:
    # `use_r1 and i % 2 == 1`), so its training-throughput envelope
    # blends R1 and plain D iterations — measure both and report the
    # blended steady-state pair.
    d_step_plain = jax.jit(lambda s, br, bf: gan_lib.d_step(
        s, br, bf, gen, disc, opt_d, cfg, use_r1_now=False,
        blur_active='--steady' not in sys.argv))

    bg = make_batch(jax.random.PRNGKey(1), False)
    br = make_batch(jax.random.PRNGKey(2), True)
    bf = make_batch(jax.random.PRNGKey(3), False)

    t0 = time.time()
    state, mg = g_step(state, bg)
    sync(mg)
    print(f'g_step compile+1: {time.time() - t0:.1f}s', flush=True)
    t0 = time.time()
    state, md = d_step(state, br, bf)
    sync(md)
    print(f'd_step compile+1: {time.time() - t0:.1f}s', flush=True)

    n = 6
    t0 = time.time()
    for _ in range(n):
        state, mg = g_step(state, bg)
    sync(mg)
    tg = (time.time() - t0) / n
    if g_step_xla_reg is not None:
        state, mgx = g_step_xla_reg(state, bg)
        sync(mgx)
        t0 = time.time()
        for _ in range(n):
            state, mgx = g_step_xla_reg(state, bg)
        sync(mgx)
        tgx = (time.time() - t0) / n
        print(f'g_step A/B: windowed-reg {tg * 1e3:.0f} ms vs xla-reg '
              f'{tgx * 1e3:.0f} ms', flush=True)
    t0 = time.time()
    for _ in range(n):
        state, md = d_step(state, br, bf)
    sync(md)
    td = (time.time() - t0) / n
    state, md0 = d_step_plain(state, br, bf)
    sync(md0)
    t0 = time.time()
    for _ in range(n):
        state, md0 = d_step_plain(state, br, bf)
    sync(md0)
    td0 = (time.time() - t0) / n
    td_blend = 0.5 * (td + td0)
    print(f'batch {batch}: g_step {tg * 1e3:.0f} ms, d_step(R1) '
          f'{td * 1e3:.0f} ms, d_step(plain) {td0 * 1e3:.0f} ms, '
          f'blended pair {(tg + td_blend) * 1e3:.0f} ms -> '
          f'{batch / (tg + td_blend):.2f} im/s/chip '
          f'(reference R1-every-2 cadence); '
          f'R1-every-step pair {(tg + td) * 1e3:.0f} ms -> '
          f'{batch / (tg + td):.2f} im/s/chip')


if __name__ == '__main__':
    main()
