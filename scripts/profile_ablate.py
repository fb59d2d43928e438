"""Ablation profile of the flagship render forward on the local accelerator.

Times each stage of the hot path independently (synthesis, triplane gather,
decoder MLP, sample_pdf, sort_merge, composite, full coarse-only and
coarse+fine renders) so the perf work targets the real bottleneck.

Run: python scripts/profile_ablate.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(fn):
    """Wraps fn so it returns one f32 scalar — device->host sync is then
    cheap (the tunnel backend makes large-array fetches minutes-slow)."""
    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                   if hasattr(l, 'shape'))
    return jax.jit(wrapped)


def timeit(name, fn, *args, iters=5):
    fn = _scalarize(fn)
    np.asarray(fn(*args))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:40s} {dt * 1e3:10.2f} ms', flush=True)
    return dt


def main():
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.ops import triplane as triplane_ops
    from nerf_from_image_tpu.render import render
    from nerf_from_image_tpu.core import sampling, compositing

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    res = 128
    s = 64
    n_rays = res * res
    n_pts = n_rays * s
    dtype = jnp.bfloat16

    gen = Generator(latent_dim=512, scene_range=0.55, attention_values=10,
                    use_sdf=True, img_resolution=256, dtype=dtype)
    z0 = jnp.zeros((batch, 512))
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z0)

    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 512))
    cam = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4)).at[:, 2, 3].set(2.0)
    focal = jnp.full((batch,), 1.2)

    # -- stage 1: mapping + synthesis ------------------------------------
    @jax.jit
    def map_synth(variables, z):
        ws = gen.apply(variables, z, method=Generator.map)
        return gen.apply(variables, ws, method=Generator.synthesize)

    state = map_synth(variables, z)
    timeit('mapping+synthesis+pack', map_synth, variables, z)

    pts = jax.random.uniform(jax.random.PRNGKey(2), (batch, n_pts, 3),
                             minval=-0.5, maxval=0.5, dtype=dtype)

    # -- stage 2: triplane gather alone -----------------------------------
    @jax.jit
    def gather_only(packed, pts):
        return triplane_ops.sample_packed_triplane(packed, pts / 0.55, 256)

    timeit('triplane gather (1 pass)', gather_only, state.packed_planes, pts)

    # -- stage 3: full sampler (gather + MLP + sdf + attention) -----------
    @jax.jit
    def sampler_full(variables, state, pts):
        return gen.apply(variables, state, pts, ('sigma', 'rgb'),
                         method=Generator.sample)

    timeit('sampler full (1 pass)', sampler_full, variables, state, pts)

    # -- stage 4: sample_pdf ----------------------------------------------
    zc = jnp.linspace(1.0, 3.0, s, dtype=dtype)
    zc = jnp.broadcast_to(zc, (batch * n_rays, s))
    w = jax.random.uniform(jax.random.PRNGKey(3), (batch * n_rays, s),
                           dtype=dtype)

    @jax.jit
    def pdf_only(zmid, w):
        return sampling.sample_pdf(zmid, w[..., 1:-1], s, rng=None)

    zmid = 0.5 * (zc[..., 1:] + zc[..., :-1])
    timeit('sample_pdf', pdf_only, zmid, w)

    # -- stage 5: sort_merge -----------------------------------------------
    zf = jax.random.uniform(jax.random.PRNGKey(4),
                            (batch, res, res, s), dtype=dtype) * 2 + 1
    zc4 = jnp.broadcast_to(jnp.linspace(1.0, 3.0, s, dtype=dtype),
                           (batch, res, res, s))
    sig = jax.random.uniform(jax.random.PRNGKey(5),
                             (batch, res, res, s, 1), dtype=dtype)
    rgbv = jax.random.uniform(jax.random.PRNGKey(6),
                              (batch, res, res, s, 10), dtype=dtype)

    @jax.jit
    def merge_only(zc4, zf, sig, rgbv):
        return sampling.sort_merge(zc4, zf, (sig, sig), (rgbv, rgbv))

    timeit('sort_merge', merge_only, zc4, zf, sig, rgbv)

    # -- stage 6: composite -------------------------------------------------
    sig2 = jax.random.uniform(jax.random.PRNGKey(7),
                              (batch, res, res, 2 * s), dtype=dtype)
    rgb2 = jax.random.uniform(jax.random.PRNGKey(8),
                              (batch, res, res, 2 * s, 3), dtype=dtype)
    rd = jax.random.normal(jax.random.PRNGKey(9), (batch, res, res, 3),
                           dtype=dtype)
    zv = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 2 * s, dtype=dtype),
                          (batch, res, res, 2 * s))

    @jax.jit
    def comp_only(sig2, rgb2, rd, zv):
        return compositing.render_volume_density(sig2, rgb2, rd, zv,
                                                 white_background=True)

    timeit('composite', comp_only, sig2, rgb2, rd, zv)

    # -- full renders ------------------------------------------------------
    def make_forward(fine):
        @jax.jit
        def forward(variables, z, cam, focal):
            ws = gen.apply(variables, z, method=Generator.map)
            st = gen.apply(variables, ws, method=Generator.synthesize)

            def sample_fn(p, reqs):
                return gen.apply(variables, st, p, reqs,
                                 method=Generator.sample)

            out = render(sample_fn, res, res, cam, focal, None, None,
                         scene_range=0.55, white_background=True,
                         depth_samples_per_ray=s, rng=None,
                         fine_sampling=fine)
            return out.rgb
        return forward

    t_coarse = timeit('FULL coarse only', make_forward(False),
                      variables, z, cam, focal)
    t_full = timeit('FULL coarse+fine', make_forward(True),
                    variables, z, cam, focal)
    rays = batch * n_rays
    print(f'\nrays/s coarse-only: {rays / t_coarse:,.0f}')
    print(f'rays/s coarse+fine: {rays / t_full:,.0f}')


if __name__ == '__main__':
    main()
