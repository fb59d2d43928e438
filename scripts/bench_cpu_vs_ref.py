"""CPU-vs-CPU throughput: reference run.py vs the rebuild, SAME HOST.

The first apples-to-apples measurement of the two stacks (VERDICT r2
next #8): the reference supports CPU execution (`--gpus 0`,
run.py:54-57) and is run here with TorchScript ON (its production CPU
path), full-width StyleGAN channels, at a mid-size config; the rebuild
runs the identical config through its jitted g_step/d_step on the XLA
CPU backend. Metric: steady-state G+D pair im/s (the reference's own
throughput scalar, run.py:1192-1198).

Usage: python scripts/bench_cpu_vs_ref.py [--resolution 64] [--batch 4]
Prints both numbers; record them in PERF.md.
"""

import argparse
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_reference(res, batch, latent):
    from scripts import gen_trajectory_golden as gg
    work = tempfile.mkdtemp(prefix='cpu_bench_')
    data_dir = os.path.join(work, 'data')
    root_dir = os.path.join(work, 'root')
    os.makedirs(data_dir)
    os.makedirs(root_dir)
    rng = np.random.RandomState(11)
    gg.make_dataset(data_dir, rng, res=res, n_images=8,
                    focal_px=1.2 * res)
    ckpt_rel = os.path.join('cpubench', 'init.pth')
    # Full-width model: pass the reference's own channel defaults.
    gg.build_init_checkpoint(
        os.path.join(root_dir, 'gan_checkpoints', ckpt_rel),
        channel_base=32768, channel_max=512, latent_dim=latent,
        resolution=res)

    env = dict(os.environ)
    env.update({
        'REF_NO_DATASET_OVERRIDES': '1',
        'CUDA_VISIBLE_DEVICES': '',
        'PYTHONPATH': os.pathsep.join(
            [os.path.join(REPO, 'scripts', 'ref_stubs'), '/root/reference']
            + env.get('PYTHONPATH', '').split(os.pathsep)),
    })
    # TorchScript stays ON (no PYTORCH_JIT=0): this is the reference's
    # fastest CPU path. We only need the im/s print at iteration 3, so
    # run 4 iterations (G, D, G, D + '[3] im/s'). The dataset-override
    # no-op needs a tiny driver because run.py is module-level code.
    driver = (
        "import sys, os\n"
        "sys.argv = ['run.py', '--dataset', 'carla',\n"
        f"            '--data_path', {data_dir!r},\n"
        f"            '--root_path', {root_dir!r},\n"
        "            '--gpus', '0', '--batch_size', '%d',\n"
        "            '--iterations', '4', '--resume_from', %r,\n"
        "            '--latent_dim', '%d', '--resolution', '%d']\n"
        "from data import loaders\n"
        "loaders.override_default_args = lambda a: None\n"
        "import runpy\n"
        "runpy.run_path('/root/reference/run.py', run_name='__main__')\n"
        % (batch, ckpt_rel, latent, res))
    out = subprocess.run([sys.executable, '-c', driver], env=env,
                         capture_output=True, text=True, cwd=REPO)
    sys.stderr.write(out.stderr[-2000:])
    m = re.findall(r'\[3\] im/s ([0-9.eE+-]+)', out.stdout)
    assert m, f'no im/s line in reference output:\n{out.stdout[-3000:]}'
    return float(m[-1])


def bench_rebuild(res, batch, latent, steps=3):
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    os.environ.pop('PALLAS_AXON_POOL_IPS', None)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from nerf_from_image_tpu.train import gan as gan_lib

    cfg = gan_lib.GANConfig(
        resolution=res, latent_dim=latent, depth_samples_per_ray=64,
        fine_sampling=True, scene_range=3.0, white_background=True,
        use_sdf=True, attention_values=10, tv=0.5, entropy=0.05,
        eikonal=0.1, r1=5.0, path_length_regularization=False,
        augment_p_max=0.0, batch_size=batch, use_pallas=False,
        plane_resolution=256, lr_warmup=False)
    gen, disc = gan_lib.make_models(cfg)
    opt_g, opt_d = gan_lib.make_optimizers(cfg)
    state = jax.jit(lambda k: gan_lib.init_train_state(k, cfg))(
        jax.random.PRNGKey(0))

    pose = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4)).at[:, 2, 3].set(10.0)
    batch_g = {'pose': pose, 'focal': jnp.full((batch,), 1.2),
               'z': jax.random.normal(jax.random.PRNGKey(1),
                                      (batch, latent))}
    batch_real = dict(batch_g)
    batch_real['image'] = jax.random.uniform(
        jax.random.PRNGKey(2), (batch, res, res, 3), minval=-1, maxval=1)

    g_jit = jax.jit(lambda s, b: gan_lib.g_step(s, b, gen, disc, opt_g,
                                                cfg))
    d_jit = jax.jit(lambda s, br, bf: gan_lib.d_step(
        s, br, bf, gen, disc, opt_d, cfg, use_r1_now=True,
        blur_active=True))

    # Warmup (compile) pair.
    state, mg = g_jit(state, batch_g)
    state, md = d_jit(state, batch_real, batch_g)
    jax.block_until_ready(md)

    t0 = time.time()
    for _ in range(steps):
        state, mg = g_jit(state, batch_g)
        state, md = d_jit(state, batch_real, batch_g)
    jax.block_until_ready(md)
    pair_s = (time.time() - t0) / steps
    return batch / pair_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--resolution', type=int, default=64)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--latent', type=int, default=512)
    ap.add_argument('--skip_reference', action='store_true')
    args = ap.parse_args()

    if not args.skip_reference:
        ref = bench_reference(args.resolution, args.batch, args.latent)
        print(f'reference (torch CPU, TorchScript): {ref:.4f} im/s '
              f'@ res {args.resolution} batch {args.batch}')
    rb = bench_rebuild(args.resolution, args.batch, args.latent)
    print(f'rebuild (JAX XLA CPU):               {rb:.4f} im/s '
          f'@ res {args.resolution} batch {args.batch}')


if __name__ == '__main__':
    main()
