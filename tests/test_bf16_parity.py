"""bf16-vs-f32 compute-dtype validation gate.

The reference explicitly disables TF32 for numeric reproducibility
(/root/reference/run.py:59-60). This rebuild defaults --compute_dtype to
bfloat16 on TPU; this gate renders the same scene with the same f32
weights under both compute dtypes and pins the allowed drift, so a
regression in mixed-precision handling (e.g. an accumulation moved to
bf16) fails CI rather than silently corrupting FID/PSNR parity.

The TPU-scale companion (flagship 128^2 render on a real chip) is
scripts/bf16_parity.py; its measured number is recorded in PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.render import render


def _render_with_dtype(dtype, variables, z, cam, focal):
    gen = Generator(latent_dim=64, scene_range=0.55, attention_values=4,
                    use_sdf=True, img_resolution=64,
                    use_pallas=False, dtype=dtype)

    def fwd(variables, z, cam, focal):
        ws = gen.apply(variables, z, method=Generator.map)
        state = gen.apply(variables, ws, method=Generator.synthesize)

        def sample_fn(pts, reqs):
            return gen.apply(variables, state, pts, reqs,
                             method=Generator.sample)

        out = render(sample_fn, 32, 32, cam, focal, None, None,
                     scene_range=0.55, white_background=True,
                     depth_samples_per_ray=16, rng=None,
                     fine_sampling=True)
        return out.rgb, out.mask

    return jax.jit(fwd)(variables, z, cam, focal)


def test_bf16_render_drift_bounded():
    gen_f32 = Generator(latent_dim=64, scene_range=0.55, attention_values=4,
                        use_sdf=True, img_resolution=64,
                        use_pallas=False)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    variables = jax.jit(gen_f32.init)(jax.random.PRNGKey(0), z)
    cam = jnp.broadcast_to(jnp.eye(4), (2, 4, 4)).at[:, 2, 3].set(2.0)
    focal = jnp.full((2,), 1.2)

    rgb_f32, mask_f32 = _render_with_dtype(jnp.float32, variables, z, cam,
                                           focal)
    rgb_bf16, mask_bf16 = _render_with_dtype(jnp.bfloat16, variables, z,
                                             cam, focal)

    a = np.asarray(rgb_f32, np.float64)
    b = np.asarray(rgb_bf16, np.float64)
    # Images live in [-1, 1]; PSNR on the [0, 1] scale.
    mse = np.mean(np.square((a - b) / 2.0))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 30.0, f'bf16 render drift too large: PSNR={psnr:.2f} dB'

    mask_err = np.abs(np.asarray(mask_f32, np.float64) -
                      np.asarray(mask_bf16, np.float64)).mean()
    assert mask_err < 0.02, f'bf16 mask drift too large: {mask_err:.4f}'
