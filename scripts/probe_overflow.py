"""Measures windowed-sampler overflow counts (coarse + fine pass) at the
training operating point, and where the overflowing blocks come from.

Usage: python scripts/probe_overflow.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.core import compositing, rays as rays_lib, sampling
from nerf_from_image_tpu.ops.pallas import triplane_window as tw
from nerf_from_image_tpu.train import gan as gan_lib
from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.render import renderer as renderer_lib


def main():
    positional = [a for a in sys.argv[1:] if not a.startswith('--')]
    batch = int(positional[0]) if positional else 8
    dist = 4.0
    for a in sys.argv[1:]:
        if a.startswith('--dist='):
            dist = float(a.split('=')[1])
    cfg = gan_lib.GANConfig(resolution=128, latent_dim=512,
                            depth_samples_per_ray=64, fine_sampling=True,
                            attention_values=4, batch_size=batch,
                            plane_resolution=256, use_pallas=True)
    dtype = jnp.bfloat16
    gen, _ = gan_lib.make_models(cfg, dtype)
    state = jax.jit(lambda k: gan_lib.init_train_state(k, cfg, dtype=dtype))(
        jax.random.PRNGKey(0))

    pose = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4)).at[:, 2, 3].set(dist)
    print(f'camera distance {dist} (object ~'
          f'{1.2 * cfg.scene_range / dist * cfg.resolution:.0f} px '
          f'of {cfg.resolution})')
    focal = jnp.full((batch,), 1.2)
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.latent_dim))

    @jax.jit
    def probe(params, z, pose, focal, rng):
        ws = gen.apply(params, z, method=Generator.map)
        gstate = gen.apply(params, ws, method=Generator.synthesize)
        h = w = cfg.resolution
        s = cfg.depth_samples_per_ray
        ro, rd = rays_lib.get_ray_bundle(h, w, focal, pose, None, None)
        rd = renderer_lib.normalize(rd)
        near, far = rays_lib.compute_near_far_planes(ro, rd, cfg.scene_range)
        rng_c, rng_f = jax.random.split(rng)
        qp, zv = rays_lib.compute_query_points_from_rays(ro, rd, near, far,
                                                         s, rng=rng_c)
        r = gstate.plane_resolution
        coords_c = qp / cfg.scene_range
        _, _, _, ov_c = tw.prepare_blocks(coords_c, r)

        out = gen.apply(params, gstate, qp, ('sigma',), coord_grads=False,
                        method=Generator.sample)
        sigma = out['sigma'].reshape(batch, h, w, s)
        weights = compositing.render_volume_density_weights_only(
            sigma, rd, zv)
        weights = sampling.smooth_weights_eg3d(weights.reshape(-1, s))
        zmid = 0.5 * (zv[..., 1:] + zv[..., :-1])
        zs = sampling.sample_pdf(zmid.reshape(-1, s - 1),
                                 weights[..., 1:-1], s, rng=rng_f)
        zs = jnp.sort(zs, axis=-1).reshape(batch, h, w, s)
        qf = ro[..., None, :] + rd[..., None, :] * zs[..., :, None]
        coords_f = qf / cfg.scene_range
        uf, vf, of, ov_f = tw.prepare_blocks(coords_f, r)
        return (jnp.sum(ov_c.astype(jnp.int32)),
                jnp.sum(ov_f.astype(jnp.int32)), ov_f, uf, vf, of, coords_f)

    ovc, ovf, ov_f, uf, vf, of, coords_f = probe(
        state.params_g, z, pose, focal, jax.random.PRNGKey(7))
    nb = ov_f.shape[1]
    print(f'blocks/batch-item: {nb}, total {batch * nb}')
    print(f'coarse overflow blocks: {int(ovc)}')
    print(f'fine overflow blocks:   {int(ovf)}')

    # Where do the fine overflows come from?
    ovf_np = np.asarray(ov_f)
    uf_np, vf_np, of_np = np.asarray(uf), np.asarray(vf), np.asarray(of)
    cf = np.asarray(coords_f, np.float32)
    bi, bj = np.nonzero(ovf_np)
    print(f'{len(bi)} overflowing fine blocks; first 10 details:')
    for k in range(min(10, len(bi))):
        b, j = bi[k], bj[k]
        u, v, org = uf_np[b, j], vf_np[b, j], of_np[b, j]
        for p_idx in range(3):
            vspan = (v[p_idx].min(), v[p_idx].max())
            uspan = (u[p_idx].min(), u[p_idx].max())
            y0, x0 = org[p_idx]
            ovy = v[p_idx].max() > y0 + 127
            ovx = u[p_idx].max() > x0 + 47
            if ovy or ovx:
                print(f'  blk ({b},{j}) plane {p_idx}: vspan '
                      f'{vspan[0]:.1f}-{vspan[1]:.1f} y0={y0} '
                      f'uspan {uspan[0]:.1f}-{uspan[1]:.1f} x0={x0} '
                      f'{"Y" if ovy else ""}{"X" if ovx else ""}')


if __name__ == '__main__':
    main()
