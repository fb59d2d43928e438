"""Benchmark: volume-rendering throughput of the flagship triplane
generator on the local accelerator.

Measures rays/sec for the full forward (mapping -> StyleGAN synthesis ->
coarse+fine sampling -> composite) at the reference's operating point
(128x128 rays, 64 coarse + 64 fine samples/ray; run.py:380, 511-514).

vs_baseline divides by a provisional estimate of the reference PyTorch
pipeline on one A100 (~batch 32 G-step in ~1.1 s => ~0.47 Mrays/s/GPU,
derived from the reference's 4xA100/batch-32 training envelope —
README.md:46); replace with a measured number when a reference run is
available (BASELINE.md notes none is published).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import threading
import time

BASELINE_RAYS_PER_SEC = 0.47e6  # provisional; see module docstring

# Fail fast instead of hanging when the accelerator tunnel is down
# (observed: jax.devices() blocks indefinitely while the remote TPU
# terminal is unreachable). No number is fabricated — the process exits
# nonzero so the failure is recorded as a failure.
_WATCHDOG_S = float(os.environ.get('NFI_BENCH_WATCHDOG_S', '600'))
_ready = threading.Event()


def _watchdog():
    if not _ready.wait(_WATCHDOG_S):
        print(f'bench: accelerator not reachable within {_WATCHDOG_S:.0f}s '
              '(TPU tunnel down?); aborting', file=sys.stderr, flush=True)
        os._exit(3)


threading.Thread(target=_watchdog, daemon=True).start()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    jax.devices()  # blocks while the tunnel is down; watchdog bounds it
    _ready.set()
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.render import render

    batch = 8
    res = 128
    samples = 64

    gen = Generator(latent_dim=512, scene_range=0.55, attention_values=10,
                    use_sdf=True, img_resolution=256,
                    use_pallas=True,  # windowed triplane sampler
                    dtype=jnp.bfloat16)
    z0 = jnp.zeros((batch, 512))
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z0)

    @jax.jit
    def forward(variables, z, cam, focal):
        ws = gen.apply(variables, z, method=Generator.map)
        state = gen.apply(variables, ws, method=Generator.synthesize)

        def sample_fn(pts, reqs):
            return gen.apply(variables, state, pts, reqs,
                             method=Generator.sample)

        out = render(sample_fn, res, res, cam, focal, None, None,
                     scene_range=0.55, white_background=True,
                     depth_samples_per_ray=samples, rng=None,
                     fine_sampling=True)
        return out.rgb

    cam = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4)).at[:, 2, 3].set(2.0)
    focal = jnp.full((batch,), 1.2)
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 512))

    # Warmup/compile (force a full device->host sync; block_until_ready on
    # the experimental tunnel backend can return before execution).
    import numpy as np
    np.asarray(forward(variables, z, cam, focal))

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(variables, z, cam, focal)
    np.asarray(out)
    elapsed = time.perf_counter() - t0

    rays = batch * res * res * n_iters
    rays_per_sec = rays / elapsed
    print(json.dumps({
        'metric': 'render_rays_per_sec_per_chip',
        'value': round(rays_per_sec, 1),
        'unit': 'rays/s (128^2, 64+64 samples, bf16)',
        'vs_baseline': round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
