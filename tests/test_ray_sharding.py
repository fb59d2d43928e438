"""Ray-axis sharding parity: a render with the (B, H, W) ray tensors
sharded over a 'rays' mesh axis must equal the unsharded render (rays
are embarrassingly parallel, SURVEY §5; wired into the demo/eval path
via render(ray_sharding=...))."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.parallel import mesh as mesh_lib
from nerf_from_image_tpu.render import render


def test_ray_sharded_render_matches_unsharded():
    mesh = mesh_lib.create_mesh('data:1,rays:8')
    gen = Generator(latent_dim=16, scene_range=0.55, attention_values=4,
                    use_sdf=True, img_resolution=32, use_pallas=False)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), z)
    cam = jnp.broadcast_to(jnp.eye(4), (1, 4, 4)).at[:, 2, 3].set(2.0)
    focal = jnp.full((1,), 1.2)

    def fwd(variables, z, cam, focal, ray_sharding=None):
        ws = gen.apply(variables, z, method=Generator.map)
        state = gen.apply(variables, ws, method=Generator.synthesize)

        def sample_fn(pts, reqs):
            return gen.apply(variables, state, pts, reqs,
                             method=Generator.sample)

        out = render(sample_fn, 32, 32, cam, focal, None, None,
                     scene_range=0.55, white_background=True,
                     depth_samples_per_ray=8, rng=None,
                     fine_sampling=True, ray_sharding=ray_sharding)
        return out.rgb, out.depth, out.mask

    ref = jax.jit(fwd)(variables, z, cam, focal)
    spec = mesh_lib.ray_spec(mesh)
    with mesh:
        sharded = jax.jit(
            lambda v, z_, c, f: fwd(v, z_, c, f, ray_sharding=spec))(
            variables, z, cam, focal)
        # The constraint must actually shard the per-ray compute: check
        # the output still assembles to the full image and each leaf
        # matches the single-device reference.
    for a, b in zip(ref, sharded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)
