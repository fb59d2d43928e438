"""Windowed Pallas kernel under SPMD (VERDICT r2 missing #3).

The reference scatters the same model across devices unconditionally via
DataParallel (run.py:636-644); the rebuild's equivalent is the batch axis
of the `data` mesh. These tests put the flagship Pallas kernel (and its
custom VJP) behind a sharded jit on a 2-device CPU mesh so a
kernel/GSPMD boundary regression fails CI. The kernel runs in Pallas
interpret mode on CPU; 2 devices keeps the serialized executions inside
the collective rendezvous budget (see scripts/check_pallas_spmd.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_from_image_tpu.ops import triplane as tri
from nerf_from_image_tpu.ops.pallas import triplane_window as tw


def _mesh2():
    devs = jax.devices()[:2]
    if len(devs) < 2:
        pytest.skip('needs >=2 devices')
    return Mesh(np.asarray(devs), ('data',))


def test_windowed_kernel_batch_sharded_parity():
    """Batch-sharded windowed kernel == unsharded XLA quad-table path."""
    mesh = _mesh2()
    B, R, H, W, S = 2, 64, 8, 8, 4
    planes = jax.random.normal(jax.random.PRNGKey(0), (B, 3, 32, R, R),
                               jnp.float32)
    base = jax.random.uniform(jax.random.PRNGKey(1),
                              (B, 1, 1, 1, 1, 1, 1, 3),
                              minval=-0.5, maxval=0.5)
    jit_ = jax.random.uniform(jax.random.PRNGKey(2),
                              (B, 1, H, 1, W, 1, S, 3),
                              minval=-0.04, maxval=0.04)
    coords = jnp.clip(base + jit_, -1, 1).reshape(B, H, W, S, 3)

    pdma = tw.plane_layout_for_dma(planes)
    shard_b = NamedSharding(mesh, P('data'))
    planes_s = jax.device_put(planes, shard_b)
    pdma_s = jax.device_put(pdma, shard_b)
    coords_s = jax.device_put(coords, shard_b)

    feats, resid = jax.jit(
        lambda pl, pd, c: tw.sample_triplane_windowed(pl, pd, None, c),
        in_shardings=(shard_b, shard_b, shard_b))(planes_s, pdma_s, coords_s)
    assert int(resid) == 0

    packed = tri.pack_triplane(planes.astype(jnp.bfloat16))
    ref = tri.sample_packed_triplane(packed, coords.reshape(B, -1, 3), R)
    np.testing.assert_allclose(np.asarray(feats, np.float32),
                               np.asarray(ref, np.float32), atol=6e-2)


def test_windowed_kernel_sharded_vjp():
    """The custom-VJP backward (second Pallas kernel) partitions over the
    batch axis: grads wrt planes under a sharded jit are finite, nonzero,
    and match the unsharded kernel's grads."""
    mesh = _mesh2()
    B, R, H, W, S = 2, 64, 8, 8, 4
    planes = jax.random.normal(jax.random.PRNGKey(3), (B, 3, 32, R, R),
                               jnp.float32)
    coords = jax.random.uniform(jax.random.PRNGKey(4), (B, H, W, S, 3),
                                minval=-0.4, maxval=0.4)

    def loss(pl, c):
        pd = tw.plane_layout_for_dma(pl)
        feats, _ = tw.sample_triplane_windowed(pl, pd, None, c)
        return jnp.sum(feats.astype(jnp.float32) ** 2)

    shard_b = NamedSharding(mesh, P('data'))
    g_sharded = jax.jit(jax.grad(loss),
                        in_shardings=(shard_b, shard_b))(
        jax.device_put(planes, shard_b), jax.device_put(coords, shard_b))
    g_local = jax.jit(jax.grad(loss))(planes, coords)
    gs = np.asarray(g_sharded, np.float32)
    assert np.isfinite(gs).all() and np.abs(gs).sum() > 0
    np.testing.assert_allclose(gs, np.asarray(g_local, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_gan_g_step_pallas_sharded():
    """Full sharded G step with use_pallas=True on the 2-device mesh —
    the promoted scripts/check_pallas_spmd.py (VERDICT r2 next #4).
    slow: ~140 s of interpret-mode Pallas execution on CPU; the quick
    gate's kernel/SPMD boundary coverage comes from the two tests above."""
    from nerf_from_image_tpu.train import gan as gan_lib

    mesh = _mesh2()
    batch = 4
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
    for k, v in mg.items():
        assert np.isfinite(float(v)), f'{k} not finite'
