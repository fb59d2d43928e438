"""Benchmarks the windowed Pallas triplane sampler vs the XLA gather path.

Run on the TPU: python scripts/bench_pallas_triplane.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.ops import triplane as tri
from nerf_from_image_tpu.ops.pallas import triplane_window as tw


def timeit(name, fn, *args, iters=5):
    f = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), 0.0))
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    np.asarray(o)
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:46s} {dt * 1e3:9.2f} ms', flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    R = 256
    H = W = 128
    S = 64
    k = jax.random.PRNGKey(0)
    planes = jax.random.normal(k, (batch, 3, 32, R, R),
                               jnp.float32).astype(jnp.bfloat16)
    pdma = tw.plane_layout_for_dma(planes)
    packed = tri.pack_triplane(planes)

    # Camera-like coords: per-block localized.
    base = jax.random.uniform(
        jax.random.PRNGKey(1),
        (batch, H // 8, 1, W // 8, 1, S // 4, 1, 3), minval=-0.8,
        maxval=0.8)
    jit_ = jax.random.uniform(
        jax.random.PRNGKey(2),
        (batch, H // 8, 8, W // 8, 8, S // 4, 4, 3), minval=-0.03,
        maxval=0.03)
    coords = jnp.clip(base + jit_, -1, 1).reshape(batch, H, W, S, 3)

    n = H * W * S

    def xla_path(packed, coords):
        return tri.sample_packed_triplane(packed, coords.reshape(batch, -1, 3),
                                          R)

    t_xla = timeit('XLA gather path', xla_path, packed, coords)

    def pallas_kernel_only(pdma, coords):
        u, v, origins, _ = tw.prepare_blocks(coords, R)
        return tw.sample_windowed_raw(pdma, u, v, origins)

    t_k = timeit('pallas windowed (kernel+prep, no fixup)',
                 pallas_kernel_only, pdma, coords)

    def pallas_full(planes, pdma, packed, coords):
        return tw.sample_triplane_windowed(planes, pdma, packed, coords)

    t_p = timeit('pallas windowed full (with fixup)', pallas_full, planes,
                 pdma, packed, coords)

    # Overflow rate for this geometry (block granularity)
    _, _, _, ov = jax.jit(lambda c: tw.prepare_blocks(c, R))(coords)
    frac = float(jnp.mean(ov.astype(jnp.float32)))
    print(f'overflow block fraction: {frac:.4%}')

    # On-device parity (scalar stats only; no big host transfers).
    @jax.jit
    def parity(planes, pdma, packed, coords):
        a, _ = tw.sample_triplane_windowed(planes, pdma, packed, coords)
        bref = tri.sample_packed_triplane(packed,
                                          coords.reshape(batch, -1, 3), R)
        d = jnp.abs(a.astype(jnp.float32) - bref.astype(jnp.float32))
        return jnp.max(d), jnp.mean(d)

    mx, mn = parity(planes, pdma, packed, coords)
    print(f'on-device parity: max={float(mx):.5f} mean={float(mn):.6f}')
    print(f'speedup kernel-only: {t_xla / t_k:.2f}x; full: '
          f'{t_xla / t_p:.2f}x; points/s: {batch * n / t_p / 1e6:.1f}M')


if __name__ == '__main__':
    main()
