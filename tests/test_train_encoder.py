"""Encoder distillation pipeline (run.py:1521-1706) on the CPU mesh with
a tiny SegFormer backbone: loss decreases, checkpoints round-trip, and
the split bootstrap (device dispatch + host PnP finish) matches the
synchronous path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_from_image_tpu.models.encoder import BootstrapEncoder
from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.train import encoder as enc_lib

TINY = dict(depths=(1, 1, 1, 1), embed_dims=(8, 8, 8, 16),
            num_heads=(1, 1, 1, 2), head_width=16)


def _tiny_models():
    gen = Generator(latent_dim=16, scene_range=0.55, attention_values=4,
                    use_sdf=True, img_resolution=32, use_pallas=False)
    # The generator's w space is 512-wide regardless of latent_dim
    # (stylegan mapping), so the encoder's latent head must match.
    encoder = BootstrapEncoder(latent_dim=512, **TINY)
    return gen, encoder


@pytest.mark.slow
def test_encoder_distillation_loss_decreases(tmp_path):
    gen, encoder = _tiny_models()
    cfg = enc_lib.EncoderConfig(resolution=32, latent_dim=16,
                                depth_samples_per_ray=4,
                                fine_sampling=False)
    gen_vars = jax.jit(gen.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16)))
    state = jax.jit(lambda k: enc_lib.init_train_state(k, encoder, cfg))(
        jax.random.PRNGKey(1))
    opt = enc_lib.make_optimizer()
    step = jax.jit(lambda s, b: enc_lib.train_step(s, b, encoder, gen,
                                                   gen_vars, opt, cfg))

    pose = jnp.broadcast_to(jnp.eye(4), (2, 4, 4)).at[:, 2, 3].set(2.0)
    batch = {'pose': pose, 'focal': jnp.full((2,), 1.2),
             'z': jax.random.normal(jax.random.PRNGKey(2), (2, 16))}
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics['loss_coords'] + metrics['loss_mask'] +
                            metrics['loss_latent']))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses

    # Checkpoint round-trip restores iteration + params exactly.
    from nerf_from_image_tpu.utils import checkpoint as ckpt_lib
    ckpt = ckpt_lib.CheckpointManager(str(tmp_path))
    ckpt.save(state, 'enc_latest')
    target = jax.jit(lambda k: enc_lib.init_train_state(k, encoder, cfg))(
        jax.random.PRNGKey(1))
    restored = ckpt.restore(target, 'enc_latest')
    assert int(restored.iteration) == 5
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Host-state sidecar: the encoder trainer checkpoints the host RNG +
    # batch sampler like the reference's 'random_state'
    # (run.py:1575-1605; cli/train_encoder.py resume glue), so a resumed
    # run reproduces the exact pose-batch order.
    from nerf_from_image_tpu.utils.io import EndlessSampler
    rng = np.random.RandomState(7)
    sampler = EndlessSampler(13, rng)
    sampler(5)
    ckpt.save(state, 'enc_latest',
              host_state=ckpt_lib.pack_host_state(rng, sampler))
    expect = sampler(8)
    rng2 = np.random.RandomState(0)
    sampler2 = EndlessSampler(13, rng2)
    ckpt_lib.apply_host_state(ckpt.restore_host_state('enc_latest'), rng2,
                              sampler2)
    np.testing.assert_array_equal(sampler2(8), expect)


def test_graft_segformer_backbone():
    """Pretrained MiT weights land on the backbone(s) only; heads and
    decode layers absent from the pretrain keep their init; shape
    mismatches fail loudly (cli/train_encoder.py; reference
    run.py:1568-1571 loads mit_b5.pth before encoder training)."""
    from nerf_from_image_tpu.cli.train_encoder import \
        graft_segformer_backbone

    _, encoder = _tiny_models()
    variables = encoder.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 3, 32, 32)))
    bb = variables['params']['backbone']
    # Pretrain tree: backbone keys only (as convert_segformer on
    # mit_b5.pth yields — no decode head), with recognizable values.
    mit = {k: jax.tree_util.tree_map(lambda a: np.full_like(a, 7.0), v)
           for k, v in bb.items() if k.startswith(('patch_embed', 'block',
                                                   'norm'))}
    assert mit, 'tiny backbone produced no graftable keys'
    out = graft_segformer_backbone(variables, mit)
    for k in mit:
        for leaf in jax.tree_util.tree_leaves(out['params']['backbone'][k]):
            np.testing.assert_array_equal(np.asarray(leaf), 7.0)
    # Non-backbone trees untouched.
    for k in variables['params']:
        if k == 'backbone':
            continue
        for a, b in zip(jax.tree_util.tree_leaves(variables['params'][k]),
                        jax.tree_util.tree_leaves(out['params'][k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Shape mismatch is a loud error, not a silent partial graft.
    bad = dict(mit)
    k0 = next(iter(bad))
    bad[k0] = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape + (2,), a.dtype), bad[k0])
    with pytest.raises(ValueError, match='mit_b5'):
        graft_segformer_backbone(variables, bad)


def test_bootstrap_split_matches_sync():
    """bootstrap_dispatch + bootstrap_finish (the scan-overlap path) must
    equal the synchronous bootstrap_batch."""
    from nerf_from_image_tpu.invert import pipeline as pipe

    _, encoder = _tiny_models()
    enc_params = jax.jit(encoder.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
    apply_fn = jax.jit(lambda p, x: encoder.apply(p, x,
                                                  deterministic=True))
    img = np.random.RandomState(0).uniform(
        -1, 1, (2, 32, 32, 4)).astype(np.float32)
    focal_guesses = np.asarray([1.0, 1.5, 2.0])
    z_avg = jnp.zeros((1, 15, 512))

    sync = pipe.bootstrap_batch(encoder, enc_params, img, focal_guesses,
                                z_avg, 5.0, False, apply_fn)
    enc_out = pipe.bootstrap_dispatch(apply_fn, enc_params, img)
    split = pipe.bootstrap_finish(enc_out, focal_guesses, z_avg, 5.0,
                                  False)
    for a, b in zip(sync, split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
