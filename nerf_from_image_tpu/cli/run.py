"""Flag-compatible entry point (the reference's run.py equivalent).

Preserves the reference CLI surface (--run_inversion,
--inv_export_demo_sample, --inv_steps, --inv_encoder_only,
--inv_manual_input_path, --resume_from, --dataset, --batch_size, ...;
/root/reference/run.py:42-174) on top of the TPU-native stack: device
count comes from the JAX mesh, training state checkpoints via orbax, and
the three workloads (GAN training, encoder distillation, hybrid
inversion) run through the train/ and invert/ modules.

Usage: python -m nerf_from_image_tpu.cli.run --dataset p3d_car ...
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def convert_reference_checkpoint(ckpt_t: dict, args, state):
    """Maps a loaded reference .pth checkpoint dict onto the train state
    (run.py:872-905 restore semantics): G / G-EMA / D / D2 weights via
    the torch converters, iteration / augment_p / ppl_running_avg into
    the state, best_fid into a (partial) host state so checkpoint_best
    gating continues (run.py:1493-1495). Adam optimizer moments convert
    through the same layout mapping as their weights (run.py:883-884
    restores the full optimizer state_dicts), so a .pth resume continues
    the optimizer trajectory instead of restarting moments from zero.

    Returns (state, host_state_or_None)."""
    import jax.numpy as jnp

    from nerf_from_image_tpu.train import gan as gan_lib
    from nerf_from_image_tpu.utils import torch_convert as tc

    conv = lambda sd: tc.convert_generator(
        {k: tc._np(v) for k, v in sd.items()},
        attention_values=args.attention_values,
        use_viewdir=args.use_viewdir, use_sdf=args.use_sdf)
    updates = {}
    if ckpt_t.get('model') is not None:
        updates['params_g'] = conv(ckpt_t['model'])
    updates['ema_params_g'] = conv(ckpt_t['model_ema'])
    if ckpt_t.get('discriminator') is not None:
        updates['params_d'] = tc.convert_discriminator(
            {k: tc._np(v) for k, v in ckpt_t['discriminator'].items()})
    if ckpt_t.get('discriminator2') is not None:
        updates['params_d2'] = tc.convert_discriminator(
            {k: tc._np(v) for k, v in ckpt_t['discriminator2'].items()})
    # Staged separately and merged only on full success: a partial
    # restore (G converted, D failed) would be an inconsistent optimizer
    # state matching neither the reference resume nor a fresh restart.
    opt_updates = {}
    try:
        if (ckpt_t.get('optimizer_g') is not None
                and ckpt_t.get('model') is not None):
            mu, nu, step, _ = tc.convert_adam_moments(
                ckpt_t['model'], ckpt_t['optimizer_g'], conv)
            opt_updates['opt_g'] = gan_lib.restore_adam_moments(
                state.opt_g, mu, nu, step)
        if ckpt_t.get('optimizer_d') is not None:
            # optimizer_d indexes D's params followed by D2's
            # (run.py:684-688).
            n_d = 0
            if ckpt_t.get('discriminator') is not None:
                mu, nu, step, n_d = tc.convert_adam_moments(
                    ckpt_t['discriminator'], ckpt_t['optimizer_d'],
                    tc.convert_discriminator)
                opt_updates['opt_d'] = gan_lib.restore_adam_moments(
                    state.opt_d, mu, nu, step)
            if (ckpt_t.get('discriminator2') is not None
                    and state.opt_d2 is not None):
                mu, nu, step, _ = tc.convert_adam_moments(
                    ckpt_t['discriminator2'], ckpt_t['optimizer_d'],
                    tc.convert_discriminator, index_offset=n_d)
                opt_updates['opt_d2'] = gan_lib.restore_adam_moments(
                    state.opt_d2, mu, nu, step)
        updates.update(opt_updates)
    except (KeyError, ValueError) as e:
        print('WARNING: optimizer-moment conversion failed; ALL Adam '
              f'moments restart fresh ({e})')
    host_state = None
    if ckpt_t.get('best_fid') is not None:
        host_state = {'best_fid': float(ckpt_t['best_fid'])}
    state = state.replace(
        iteration=jnp.asarray(int(ckpt_t.get('iteration', 0)), jnp.int32),
        augment_p=jnp.asarray(float(ckpt_t.get('augment_p', 0.0))),
        ppl_running_avg=jnp.asarray(
            float(ckpt_t.get('ppl_running_avg') or -1.0)),
        **updates)
    return state, host_state


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from nerf_from_image_tpu import config as config_lib
    from nerf_from_image_tpu.data import loaders
    from nerf_from_image_tpu.parallel import mesh as mesh_lib
    from nerf_from_image_tpu.train import gan as gan_lib
    from nerf_from_image_tpu.train import loop as loop_lib
    from nerf_from_image_tpu.utils import checkpoint as ckpt_lib
    from nerf_from_image_tpu.utils.logging import SummaryWriter

    args = config_lib.parse_args(argv)

    # Multi-host (pod) runs: must happen before any other JAX call.
    from nerf_from_image_tpu.parallel import distributed as dist
    dist.maybe_initialize(args)

    if args.inv_manual_input_path:
        args.inv_export_demo_sample = True
    if args.inv_export_demo_sample:
        args.run_inversion = True

    if args.dataset == 'autodetect':
        assert args.resume_from, '--dataset autodetect needs --resume_from'
        args.dataset = config_lib.autodetect_dataset(args.resume_from)

    experiment_name = config_lib.suggest_experiment_name(args)
    checkpoint_dir = os.path.join(args.root_path, 'gan_checkpoints',
                                  experiment_name)
    tensorboard_dir = os.path.join(args.root_path, 'gan_logs',
                                   experiment_name)
    report_dir = os.path.join(args.root_path, 'reports')
    print('Experiment name:', experiment_name)
    print('Devices:', jax.devices())

    mesh = mesh_lib.create_mesh(args.mesh_shape)
    dtype = jnp.bfloat16 if args.compute_dtype == 'bfloat16' else jnp.float32

    manual_image = None
    if args.inv_manual_input_path:
        from nerf_from_image_tpu.cli.demo import load_manual_image
        manual_image = load_manual_image(
            args.inv_manual_input_path,
            config_lib.get_coco_mapping()[args.dataset],
            mask_path=getattr(args, 'inv_manual_mask_path', None))

    print('Loading data...')
    dataset_config, train_split, train_eval_split, test_split = \
        loaders.load_dataset(args, manual_image)

    if args.perturb_poses > 0:
        from nerf_from_image_tpu.core import pose as pose_utils
        out = pose_utils.perturb_poses(train_split.tform_cam2world,
                                       args.perturb_poses,
                                       train_split.focal_length,
                                       train_split.bbox)
        (train_split.tform_cam2world, train_split.focal_length,
         train_split.bbox) = out
        if (train_eval_split.tform_cam2world.shape ==
                train_split.tform_cam2world.shape):
            train_eval_split.tform_cam2world = train_split.tform_cam2world
            train_eval_split.focal_length = train_split.focal_length
            train_eval_split.bbox = train_split.bbox

    cfg = gan_lib.GANConfig(
        resolution=args.resolution,
        latent_dim=args.latent_dim,
        depth_samples_per_ray=config_lib.depth_samples(args),
        fine_sampling=args.fine_sampling,
        scene_range=dataset_config['scene_range'],
        white_background=dataset_config['white_background'],
        camera_flipped=dataset_config['camera_flipped'],
        supervise_alpha=args.supervise_alpha,
        conditional_pose=args.conditional_pose,
        use_sdf=args.use_sdf,
        attention_values=args.attention_values,
        use_viewdir=args.use_viewdir,
        is_highres=dataset_config.get('is_highres', False),
        use_encoder=args.use_encoder,
        use_class=args.use_class,
        num_classes=(train_split.num_classes if args.use_class else None),
        dual_discriminator=args.dual_discriminator,
        dual_discriminator_l1=args.dual_discriminator_l1,
        dual_discriminator_mse=args.dual_discriminator_mse,
        r1=args.r1, tv=args.tv, entropy=args.entropy, eikonal=args.eikonal,
        path_length_regularization=args.path_length_regularization,
        augment_ada=args.augment_ada, augment_p_max=args.augment_p,
        ada_target=args.ada_target,
        clip_gradient_norm=args.clip_gradient_norm,
        lr_g=args.lr_g, lr_d=args.lr_d, batch_size=args.batch_size,
        use_pallas=bool(args.use_pallas),
        plane_resolution=args.plane_resolution,
        use_stylegan_noise=not args.disable_stylegan_noise)

    ckpt = ckpt_lib.CheckpointManager(checkpoint_dir)
    state = jax.jit(lambda k: gan_lib.init_train_state(
        k, cfg, dtype=dtype))(jax.random.PRNGKey(1234))
    state = mesh_lib.replicate(state, mesh)

    resume_label = None
    host_state = None
    if args.resume_from and args.resume_from.endswith('.pth'):
        # Literal reference-checkpoint path (run.py:102-132 third form).
        import torch
        print('Converting reference checkpoint', args.resume_from)
        with open(args.resume_from, 'rb') as f:
            ckpt_t = torch.load(f, map_location='cpu', weights_only=False)
        state, host_state = convert_reference_checkpoint(ckpt_t, args,
                                                         state)
        state = mesh_lib.replicate(state, mesh)
        print('Resumed (converted) from iteration', int(state.iteration))
    elif args.resume_from:
        # Resume syntax: name | name+iter (run.py:102-132).
        if '+' in args.resume_from:
            name, it = args.resume_from.split('+')
            resume_dir = os.path.join(args.root_path, 'gan_checkpoints',
                                      name)
            resume_label = it
        else:
            resume_dir = os.path.join(args.root_path, 'gan_checkpoints',
                                      args.resume_from)
            resume_label = 'latest'
        resume_ckpt = ckpt_lib.CheckpointManager(resume_dir)
        assert resume_ckpt.exists(resume_label), \
            f'checkpoint {args.resume_from} does not exist'
        state = resume_ckpt.restore(state, resume_label)
        host_state = resume_ckpt.restore_host_state(resume_label)
        print('Resumed from iteration', int(state.iteration))
    elif ckpt.exists('latest') and not args.run_inversion:
        # Auto-resume must not hard-fail on a structurally incompatible
        # checkpoint (e.g. saved by an older train-state layout) — the
        # reference's policy here is best-effort resume with a scratch
        # fallback (run.py:133-143). Explicit --resume_from stays loud.
        try:
            candidate = ckpt.restore(state, 'latest')
        except Exception as e:
            print(f'Aborting resume (incompatible latest checkpoint: {e}); '
                  'training from scratch')
            candidate = None
        if candidate is not None and int(candidate.iteration) >= 12500:
            state = candidate
            host_state = ckpt.restore_host_state('latest')
            print('Auto-resumed from iteration', int(state.iteration))
        elif candidate is not None:
            print('Aborting resume (training from scratch)')

    if args.run_inversion:
        from nerf_from_image_tpu.cli.inversion import run_inversion_cli
        run_inversion_cli(args, cfg, dataset_config, state, train_split,
                          train_eval_split, test_split, mesh, report_dir,
                          experiment_name)
        return

    # ---- GAN training ------------------------------------------------------
    # Host-side side effects (tensorboard, checkpoints) are process-0
    # only on multi-host runs; every process still computes the same
    # replicated eval values.
    from nerf_from_image_tpu.utils import io as io_lib
    main_proc = dist.is_main_process()
    if main_proc:
        io_lib.mkdir(checkpoint_dir)
    writer = SummaryWriter(tensorboard_dir) if main_proc else None

    # Evaluation stack: Inception for FID (+ LPIPS for encoder-mode
    # reconstruction metrics). Converted reference weights are loaded when
    # present; otherwise evaluation still runs with randomly initialized
    # feature nets so the FID *pipeline* is exercised (numbers are then
    # only self-consistent, not comparable — a warning is printed).
    from nerf_from_image_tpu.train.eval import GANEvaluator
    inception_apply = make_inception_apply(args)
    lpips_apply = make_lpips_apply(args) if args.use_encoder else None
    gen, _ = gan_lib.make_models(cfg, dtype)
    if args.use_pallas:
        # Eval renders are gradient-free: route them through the
        # windowed Pallas sampler (same params, no extra state).
        gen = gen.clone(use_pallas=True)
    evaluator = GANEvaluator(
        cfg, dataset_config, args.dataset, train_split, train_eval_split,
        test_split, inception_apply=inception_apply,
        lpips_apply=lpips_apply, use_encoder=args.use_encoder,
        use_class=args.use_class,
        eval_batch_size=min(args.batch_size, 8),
        stats_cache_dir=os.path.join(args.root_path, 'fid_stats'))
    if host_state is not None and 'best_fid' in host_state:
        # checkpoint_best gating survives restarts (run.py:1403-1405).
        evaluator.best_fid = float(host_state['best_fid'])
    eval_rng = np.random.RandomState(4321)

    def eval_fn(s, i):
        fid, is_best = evaluator.evaluate(s, i, gen, writer)
        if fid is not None:
            print(f'[{i}] FID: {fid:.2f} (best {evaluator.best_fid:.2f})')
        evaluator.log_training_images(s, i, gen, writer, eval_rng)
        return fid, is_best

    # SDF pretraining for fresh runs (run.py:821-868).
    if args.use_sdf and int(state.iteration) == 0:
        from nerf_from_image_tpu.train.pretrain import pretrain_sdf
        print('SDF pre-training...')
        state = pretrain_sdf(state, cfg, mesh, args.eikonal, lr=args.lr_g,
                             dtype=dtype)

    state = loop_lib.train_gan(
        state, cfg, train_split, mesh,
        num_iters=args.iterations, writer=writer,
        ckpt_manager=ckpt if main_proc else None, eval_fn=eval_fn,
        profile_trace_at=args.profile_trace_at,
        trace_dir=os.path.join(tensorboard_dir, 'trace'),
        dtype=dtype, host_state=host_state,
        host_state_extra=lambda: {'best_fid': evaluator.best_fid})
    if main_proc:
        ckpt.save(state, 'latest')
    print('Training done.')


def make_inception_apply(args):
    """Jitted InceptionV3-FID activations fn; loads converted TF-FID weights
    from {root_path}/weights/inception.npz when present.

    Construction is LAZY (first call): a short run that never reaches an
    eval (< iteration 3) must not pay for initializing/compiling
    InceptionV3. The random-weights fallback init is jitted — eager flax
    init executes the graph op-by-op, ~400 one-op XLA compiles."""
    import jax
    import jax.numpy as jnp

    state = {}

    def build():
        from nerf_from_image_tpu.models.inception import InceptionV3FID
        from nerf_from_image_tpu.utils.weights import load_npz_variables

        net = InceptionV3FID()
        path = os.path.join(args.root_path, 'weights', 'inception.npz')
        variables = load_npz_variables(path)
        if variables is None:
            print(f'WARNING: no converted Inception weights at {path}; '
                  'FID uses a randomly initialized Inception (numbers are '
                  'self-consistent only). Run scripts/convert_weights.py.')
            variables = jax.jit(net.init)(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 3, 32, 32)))
        _jit = jax.jit(net.apply)
        # Pass the weights as a runtime argument — closing over them bakes
        # ~90 MB of constants into the executable (HBM-resident per
        # program).
        state['fn'] = lambda im: _jit(variables, im)

    def apply(im):
        if 'fn' not in state:
            build()
        return state['fn'](im)

    return apply


def make_lpips_apply(args):
    """Jitted LPIPS distance fn on [0,1] NCHW pairs; loads converted VGG16
    + lin weights from {root_path}/weights/lpips.npz when present.
    Lazily built on first call (see make_inception_apply)."""
    import jax
    import jax.numpy as jnp

    state = {}

    def build():
        from nerf_from_image_tpu.models.lpips import LPIPS
        from nerf_from_image_tpu.utils.weights import load_npz_variables

        net = LPIPS()
        path = os.path.join(args.root_path, 'weights', 'lpips.npz')
        variables = load_npz_variables(path)
        if variables is None:
            print(f'WARNING: no converted LPIPS weights at {path}; '
                  'LPIPS uses a randomly initialized VGG16.')
            variables = jax.jit(net.init)(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 3, 32, 32)),
                                          jnp.zeros((1, 3, 32, 32)))
        _jit = jax.jit(lambda v, a, b: net.apply(v, a, b, normalize=True))
        state['fn'] = lambda a, b: _jit(variables, a, b)

    def apply(a, b):
        if 'fn' not in state:
            build()
        return state['fn'](a, b)

    return apply


if __name__ == '__main__':
    main()
