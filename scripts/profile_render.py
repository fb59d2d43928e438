"""Times each stage of the render pipeline on the local accelerator."""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.render import render as render_fn
from nerf_from_image_tpu.core import grids

B, RES, S = 8, 128, 64
DTYPE = jnp.bfloat16


def timeit(name, fn, *args, iters=5):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:40s} {dt * 1000:9.2f} ms')
    return dt


def main():
    gen = Generator(latent_dim=512, scene_range=0.55, attention_values=10,
                    use_sdf=True, img_resolution=256, dtype=DTYPE)
    z0 = jnp.zeros((B, 512))
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z0)
    z = jax.random.normal(jax.random.PRNGKey(1), (B, 512))

    map_fn = jax.jit(lambda z: gen.apply(variables, z, method=Generator.map))
    ws = map_fn(z)
    timeit('mapping', map_fn, z)

    synth_fn = jax.jit(
        lambda ws: gen.apply(variables, ws, method=Generator.synthesize))
    state = synth_fn(ws)
    timeit('synthesis (256^2 planes + texture)', synth_fn, ws)

    n_pts = RES * RES * S
    pts = jax.random.uniform(jax.random.PRNGKey(2), (B, n_pts, 1, 3),
                             minval=-0.5, maxval=0.5)

    @jax.jit
    def sample_sigma(state, pts):
        return gen.apply(variables, state, pts, ('sigma',),
                         method=Generator.sample)['sigma']

    timeit(f'sample sigma ({B}x{n_pts} pts)', sample_sigma, state, pts)

    @jax.jit
    def sample_full(state, pts):
        return gen.apply(variables, state, pts, ('sigma', 'rgb'),
                         method=Generator.sample)

    timeit('sample sigma+rgb', sample_full, state, pts)

    @jax.jit
    def gs_only(planes, coords):
        return grids.grid_sample2d(planes[:, 0], coords[..., :2])

    coords = pts.reshape(B, 1, -1, 3) / 0.55
    timeit('grid_sample one plane', gs_only, state.planes, coords)

    @jax.jit
    def decode_only(planes, coords):
        return gen.apply(variables, planes, coords,
                         method=Generator.decode)['features']

    timeit('triplane decode (3x gs + MLP)', decode_only, state.planes,
           coords)

    def sample_closure(p, reqs):
        return gen.apply(variables, state, p, reqs, method=Generator.sample)

    cam = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).at[:, 2, 3].set(2.0)
    focal = jnp.full((B,), 1.2)

    @jax.jit
    def full_render_nofine(cam, focal):
        return render_fn(sample_closure, RES, RES, cam, focal, None, None,
                         0.55, True, S, rng=None, fine_sampling=False).rgb

    timeit('full render (coarse only)', full_render_nofine, cam, focal)

    @jax.jit
    def full_render(cam, focal):
        return render_fn(sample_closure, RES, RES, cam, focal, None, None,
                         0.55, True, S, rng=None, fine_sampling=True).rgb

    timeit('full render (coarse+fine)', full_render, cam, focal)


if __name__ == '__main__':
    main()
