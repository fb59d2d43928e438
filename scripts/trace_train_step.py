"""Captures a jax.profiler trace of the flagship g_step/d_step on the
chip and (if the trace lands) prints the top self-time ops.

Usage: python scripts/trace_train_step.py [batch] [outdir]
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(tree):
    np.asarray(sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(tree)))


def main():
    from nerf_from_image_tpu.train import gan as gan_lib

    positional = [a for a in sys.argv[1:] if not a.startswith('--')]
    batch = int(positional[0]) if positional else 8
    outdir = positional[1] if len(positional) > 1 else '/tmp/nfi_trace'
    cfg = gan_lib.GANConfig(resolution=128, latent_dim=512,
                            depth_samples_per_ray=64, fine_sampling=True,
                            attention_values=4, batch_size=batch,
                            plane_resolution=256, use_pallas=True,
                            augment_ada=True, augment_p_max=0.8)
    dtype = jnp.bfloat16
    gen, disc = gan_lib.make_models(cfg, dtype)
    opt_g, opt_d = gan_lib.make_optimizers(cfg)
    state = jax.jit(lambda k: gan_lib.init_train_state(k, cfg,
                                                       dtype=dtype))(
        jax.random.PRNGKey(0))

    pose = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4)).at[:, 2, 3].set(4.0)
    bg = {'pose': pose, 'focal': jnp.full((batch,), 1.2),
          'z': jax.random.normal(jax.random.PRNGKey(1),
                                 (batch, cfg.latent_dim))}

    g_step = jax.jit(lambda s, b: gan_lib.g_step(s, b, gen, disc, opt_g,
                                                 cfg))
    state, mg = g_step(state, bg)
    sync(mg)
    state, mg = g_step(state, bg)
    sync(mg)
    print('warm; tracing...', flush=True)

    jax.profiler.start_trace(outdir)
    for _ in range(3):
        state, mg = g_step(state, bg)
    sync(mg)
    jax.profiler.stop_trace()
    print('trace captured to', outdir, flush=True)

    files = glob.glob(os.path.join(outdir, '**', '*.trace.json.gz'),
                      recursive=True)
    print('trace files:', files, flush=True)
    if not files:
        # xplane-only output
        xp = glob.glob(os.path.join(outdir, '**', '*.xplane.pb'),
                       recursive=True)
        print('xplane files:', xp, flush=True)
        return
    newest = max(files, key=os.path.getmtime)
    with gzip.open(newest, 'rt') as f:
        data = json.load(f)
    events = [e for e in data.get('traceEvents', [])
              if e.get('ph') == 'X' and 'dur' in e]
    # Sum duration by name on TPU op lanes.
    from collections import defaultdict
    tot = defaultdict(float)
    for e in events:
        tot[e.get('name', '?')] += e['dur']
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:60]
    print(f'{"us_total":>12}  name')
    for name, us in top:
        print(f'{us:12.0f}  {name[:140]}')


if __name__ == '__main__':
    main()
