"""Encoder distillation CLI (the reference's train_coord_regressor).

Mirrors /root/reference/run.py:1521-1706: 120k iterations of rendering
synthetic pairs from the frozen EMA generator and supervising the
SegFormer bootstrap encoder; checkpoints every 10k.
"""

from __future__ import annotations

import os
import time

import numpy as np


def graft_segformer_backbone(enc_params, mit_params):
    """Initializes the BootstrapEncoder's SegFormer backbone(s) from
    converted mit_b5 pretrained weights (reference run.py:1568-1571 /
    models/segformer.py:278-310 load mit_b5.pth; heads and the decode
    layers absent from the pretrain keep their fresh init).

    enc_params: flax variables {'params': {'backbone': ..., ...}};
    mit_params: the 'params' tree of weights/mit_b5.npz."""
    p = dict(enc_params['params'])
    grafted = 0
    for name in ('backbone', 'backbone_latent'):
        if name not in p:
            continue
        sub = dict(p[name])
        for k, v in mit_params.items():
            if k not in sub:
                continue
            import jax
            want = jax.tree_util.tree_map(lambda a: a.shape, sub[k])
            got = jax.tree_util.tree_map(lambda a: a.shape, v)
            if want != got:
                raise ValueError(
                    f'mit_b5 weights do not fit the encoder: {name}/{k} '
                    f'has shapes {got}, encoder expects {want}')
            sub[k] = v
            grafted += 1
        p[name] = sub
    if grafted == 0:
        raise ValueError('mit_b5 weights matched no encoder backbone keys')
    out = dict(enc_params)
    out['params'] = p
    return out


def train_coord_regressor(args, gan_cfg, gen, gen_vars, train_split, mesh,
                          ckpt_manager, writer):
    import jax
    import jax.numpy as jnp

    from nerf_from_image_tpu import config as config_lib
    from nerf_from_image_tpu.models.encoder import BootstrapEncoder
    from nerf_from_image_tpu.parallel import distributed as dist
    from nerf_from_image_tpu.parallel import mesh as mesh_lib
    from nerf_from_image_tpu.train import encoder as enc_lib
    from nerf_from_image_tpu.utils import checkpoint as ckpt_lib
    from nerf_from_image_tpu.utils.io import EndlessSampler

    encoder = BootstrapEncoder(latent_dim=args.latent_dim,
                               separate_backbones=args.inv_use_separate)
    # Distillation targets are frozen-EMA renders (stop_gradient), so the
    # windowed Pallas sampler can serve them (no VJP needed).
    if getattr(args, 'use_pallas', 0):
        gen = gen.clone(use_pallas=True)
    cfg = enc_lib.EncoderConfig(
        resolution=args.resolution, latent_dim=args.latent_dim,
        depth_samples_per_ray=config_lib.depth_samples(args),
        fine_sampling=args.fine_sampling,
        scene_range=gan_cfg.scene_range,
        white_background=gan_cfg.white_background)

    state = jax.jit(lambda k: enc_lib.init_train_state(k, encoder, cfg))(
        jax.random.PRNGKey(99))

    # ImageNet-pretrained MiT-B5 backbone init (the reference loads
    # mit_b5.pth before encoder training, run.py:1568-1571; convert it
    # with scripts/convert_weights.py --kind mit_b5 — see SETUP.md).
    # A resumed run's own weights overwrite this below.
    from nerf_from_image_tpu.utils.weights import load_npz_variables
    mit_path = os.path.join(args.root_path, 'weights', 'mit_b5.npz')
    mit = load_npz_variables(mit_path)
    if mit is not None:
        state = state.replace(
            params=graft_segformer_backbone(state.params, mit['params']))
        print('Initialized SegFormer backbone(s) from', mit_path)
    else:
        print(f'WARNING: no pretrained SegFormer at {mit_path}; the '
              'encoder backbone trains from random init (the reference '
              'starts from mit_b5.pth — see SETUP.md)')

    state = mesh_lib.replicate(state, mesh)

    # Checkpoint writes are process-0 only on multi-host runs
    # (parallel/distributed.py contract); all processes compute and
    # restore identically.
    main_proc = dist.is_main_process()

    rng_np = np.random.RandomState(1234)
    sampler = EndlessSampler(len(train_split.images), rng_np)
    if ckpt_manager.exists('enc_latest'):
        state = ckpt_manager.restore(state, 'enc_latest')
        # Host RNG + batch-sampler ride a sidecar npz so a resumed run
        # reproduces the exact pose-batch order (the reference encoder
        # checkpoint carries 'random_state', run.py:1575-1605).
        hs = ckpt_manager.restore_host_state('enc_latest')
        if hs is not None:
            ckpt_lib.apply_host_state(hs, rng_np, sampler)
        print('Resumed encoder from iteration', int(state.iteration))

    opt = enc_lib.make_optimizer()
    # State is threaded; donate so params/optimizer update in place.
    step = jax.jit(lambda s, b: enc_lib.train_step(s, b, encoder, gen,
                                                   gen_vars, opt, cfg),
                   donate_argnums=0)

    i = int(state.iteration)
    t0 = time.time()
    while i < cfg.max_iters:
        idx = sampler(args.batch_size)
        batch = {
            'pose': jnp.asarray(train_split.tform_cam2world[idx]),
        }
        if train_split.focal_length is not None:
            batch['focal'] = jnp.asarray(train_split.focal_length[idx])
        if train_split.bbox is not None:
            batch['bbox'] = jnp.asarray(train_split.bbox[idx])
        if train_split.center is not None:
            # SRN principal point threads into ray-gen (run.py:1627, 1642).
            batch['center'] = jnp.asarray(train_split.center[idx])
        batch = mesh_lib.shard_batch(batch, mesh)
        state, metrics = step(state, batch)
        i += 1

        if i % 1000 == 0:
            msg = ' '.join(f'{k} {float(v):.05f}' for k, v in
                           metrics.items())
            print(f'[{i}] {msg} ({1000 * args.batch_size / (time.time() - t0):.1f} im/s)')
            t0 = time.time()
            if writer is not None:
                for k, v in metrics.items():
                    writer.add_scalar(f'coord_regressor/{k}', float(v), i)
        if i % 10000 == 0 and main_proc:
            hs = ckpt_lib.pack_host_state(rng_np, sampler)
            ckpt_manager.save(state, 'enc_latest', host_state=hs)
            if i % 20000 == 0:
                ckpt_manager.save(state, f'enc_{i}', host_state=hs)

    if main_proc:
        ckpt_manager.save(state, 'enc_latest',
                          host_state=ckpt_lib.pack_host_state(rng_np,
                                                              sampler))
    return state.params
