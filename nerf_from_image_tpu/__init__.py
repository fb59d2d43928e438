"""TPU-native framework for single-image shape/pose/appearance recovery.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
google-research/nerf-from-image (CVPR 2023): 3D-aware GAN training with a
triplane SDF radiance field, bootstrapped encoder distillation, and hybrid
(encoder + PnP + gradient) inversion — built TPU-first:

- All compute-path math is functional JAX with static shapes, jitted and
  sharded with `jax.sharding` over a device mesh.
- Hot per-ray loops (triplane sampling, SDF->density, alpha compositing)
  have fused Pallas TPU kernels with XLA reference paths.
- Host-side native components (PnP pose solver, RLE mask codec) are C++.
"""

__version__ = "0.1.0"
