"""Standalone check: the windowed-Pallas triplane sampler (custom VJP)
inside a sharded GAN G step over a virtual CPU device mesh.

This lives outside `__graft_entry__.dryrun_multichip` because the kernel
runs in Pallas interpret mode on CPU; with 8 virtual devices on one host
the serialized executions overrun the collective rendezvous timeout.
Here we use a 2-device mesh, which keeps the sharded-compile coverage
(SPMD partitioning of the kernel call + its VJP) at a tolerable runtime.

Usage: python scripts/check_pallas_spmd.py [n_devices]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2

if os.environ.get('_CHECK_PALLAS_SPMD_CHILD') != '1':
    # Re-exec with a scrubbed env: the environment may force-register a
    # TPU PJRT plugin via a sitecustomize on PYTHONPATH (gated on
    # PALLAS_AXON_POOL_IPS) which overrides JAX_PLATFORMS.
    env = dict(os.environ)
    env['_CHECK_PALLAS_SPMD_CHILD'] = '1'
    env['JAX_PLATFORMS'] = 'cpu'
    flags = ' '.join(f for f in env.get('XLA_FLAGS', '').split()
                     if 'xla_force_host_platform_device_count' not in f)
    env['XLA_FLAGS'] = (
        flags + f' --xla_force_host_platform_device_count={n}'
        ' --xla_cpu_collective_call_terminate_timeout_seconds=1200'
        ' --xla_cpu_collective_timeout_seconds=1200').strip()
    for k in ('TPU_NAME', 'TPU_LIBRARY_PATH', 'PALLAS_AXON_POOL_IPS'):
        env.pop(k, None)
    if 'PYTHONPATH' in env:
        env['PYTHONPATH'] = os.pathsep.join(
            p for p in env['PYTHONPATH'].split(os.pathsep)
            if 'axon' not in p)
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__),
                               str(n)], env)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from nerf_from_image_tpu.train import gan as gan_lib  # noqa: E402


def main():
    devices = jax.devices()[:n]
    assert len(devices) == n, f'wanted {n} devices, got {len(devices)}'
    mesh = Mesh(np.asarray(devices), ('data',))
    batch = 2 * n

    cfg = gan_lib.GANConfig(resolution=16, latent_dim=32,
                            depth_samples_per_ray=4, fine_sampling=False,
                            attention_values=4, batch_size=batch,
                            plane_resolution=64, use_pallas=True,
                            use_sdf=True, tv=0.0, entropy=0.0)
    gen, disc = gan_lib.make_models(cfg)
    opt_g, _ = gan_lib.make_optimizers(cfg)
    state = jax.jit(lambda k: gan_lib.init_train_state(k, cfg))(
        jax.random.PRNGKey(20))
    state = jax.device_put(state, NamedSharding(mesh, P()))

    pose = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4)).at[:, 2, 3].set(4.0)
    b = jax.device_put(
        {
            'pose': pose,
            'focal': jnp.full((batch,), 1.2),
            'z': jax.random.normal(jax.random.PRNGKey(21),
                                   (batch, cfg.latent_dim)),
        }, NamedSharding(mesh, P('data')))

    g = jax.jit(lambda s, b: gan_lib.g_step(s, b, gen, disc, opt_g, cfg))
    state, mg = g(state, b)
    jax.block_until_ready(mg)
    print('pallas-SPMD ok:', {k: float(v) for k, v in mg.items()})


if __name__ == '__main__':
    main()
