"""Flagship-scale bf16-vs-f32 render drift measurement (run on TPU).

Renders the same randomly-initialized flagship generator (256^2 planes,
128^2 images, 64+64 depth samples) under f32 and bf16 compute dtypes with
identical f32 weights and reports PSNR / mask drift. The CI-scale gate is
tests/test_bf16_parity.py; this script produces the number recorded in
PERF.md (reference discipline: TF32 disabled for reproducibility,
/root/reference/run.py:59-60).

Usage: python scripts/bf16_parity.py [--resolution 128] [--batch 4]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')

from nerf_from_image_tpu.models.generator import Generator  # noqa: E402
from nerf_from_image_tpu.render import render  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--resolution', type=int, default=128)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--depth_samples', type=int, default=64)
    ap.add_argument('--use_pallas', type=int, default=None,
                    help='default: pallas on TPU, XLA elsewhere')
    args = ap.parse_args()

    on_tpu = jax.default_backend() == 'tpu'
    use_pallas = bool(args.use_pallas) if args.use_pallas is not None \
        else on_tpu
    print('backend:', jax.default_backend(), 'pallas:', use_pallas)

    z = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 512))
    gen_init = Generator(latent_dim=512, scene_range=0.55,
                         attention_values=10, use_sdf=True,
                         img_resolution=256, use_pallas=use_pallas)
    variables = jax.jit(gen_init.init)(jax.random.PRNGKey(0), z)
    cam = jnp.broadcast_to(jnp.eye(4),
                           (args.batch, 4, 4)).at[:, 2, 3].set(2.0)
    focal = jnp.full((args.batch,), 1.2)

    outs = {}
    for name, dtype in (('f32', jnp.float32), ('bf16', jnp.bfloat16)):
        gen = gen_init.clone(dtype=dtype)

        def fwd(variables, z, cam, focal):
            ws = gen.apply(variables, z, method=Generator.map)
            state = gen.apply(variables, ws, method=Generator.synthesize)

            def sample_fn(pts, reqs):
                return gen.apply(variables, state, pts, reqs,
                                 method=Generator.sample)

            out = render(sample_fn, args.resolution, args.resolution, cam,
                         focal, None, None, scene_range=0.55,
                         white_background=True,
                         depth_samples_per_ray=args.depth_samples,
                         rng=None, fine_sampling=True)
            return out.rgb, out.mask

        rgb, mask = jax.jit(fwd)(variables, z, cam, focal)
        outs[name] = (np.asarray(rgb, np.float64),
                      np.asarray(mask, np.float64))
        print(f'{name}: rgb mean {outs[name][0].mean():+.5f}')

    a, am = outs['f32']
    b, bm = outs['bf16']
    mse = np.mean(np.square((a - b) / 2.0))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    mask_err = np.abs(am - bm).mean()
    print(f'PSNR(f32, bf16) = {psnr:.2f} dB; mask L1 = {mask_err:.5f}')


if __name__ == '__main__':
    main()
