"""Per-stage timing of one inversion batch (r5 follow-up to the
dataset-scale run): where do the ~56 s/batch go?

Reuses the synthetic-inversion workdir artifacts
(scripts/run_synthetic_inversion.py): cached targets + random-init
encoder. Times, on the real chip:

  - encoder bootstrap (device fwd + host PnP)
  - evaluate_checkpoint (compile, then steady x2)
  - the 30-step refinement scan (compile, then steady x2)

Usage: python scripts/probe_inversion_stages.py [--workdir=/tmp/nfi_synth_640]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    workdir = '/tmp/nfi_synth_640'
    bs = 8
    scan_only = False
    for a in sys.argv[1:]:
        if a.startswith('--workdir='):
            workdir = a.split('=', 1)[1]
        if a.startswith('--bs='):
            bs = int(a.split('=', 1)[1])
        if a == '--scan-only':
            scan_only = True

    import jax
    import jax.numpy as jnp

    from nerf_from_image_tpu import config as config_lib
    from nerf_from_image_tpu.cli import inversion as inv_cli
    from nerf_from_image_tpu.invert import optimizer as inv_opt
    from nerf_from_image_tpu.invert import pipeline as pipe
    from nerf_from_image_tpu.invert import pnp
    from nerf_from_image_tpu.models.encoder import BootstrapEncoder
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.models.lpips import LPIPS
    from nerf_from_image_tpu.train import gan as gan_lib
    from nerf_from_image_tpu.utils.weights import load_npz_variables

    args = config_lib.parse_args([
        '--dataset', 'p3d_car', '--run_inversion',
        '--root_path', workdir, '--batch_size', '32',
    ])
    config_lib.override_default_args(args)
    dataset_config = config_lib.get_dataset_config(args.dataset)

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
        batch_size=args.batch_size,
        use_pallas=bool(args.use_pallas),
        plane_resolution=args.plane_resolution)

    state = jax.jit(lambda k: gan_lib.init_train_state(k, cfg))(
        jax.random.PRNGKey(1234))
    gen, _ = gan_lib.make_models(cfg)
    gen_vars = state.ema_params_g
    del state

    data = np.load(os.path.join(workdir, 'targets_640.npz'))
    images = data['images']
    rng = np.random.RandomState(4242)
    # Same pose protocol as the driver (poses are re-derivable from the
    # seed, but only focal matters for the probe's focal_guesses).
    focal = np.full((len(images),), 1.2, np.float32)

    encoder = BootstrapEncoder(latent_dim=args.latent_dim,
                               separate_backbones=args.inv_use_separate)
    enc_params = load_npz_variables(
        os.path.join(workdir, 'encoder_random.npz'))
    encoder_apply = jax.jit(lambda p, x: encoder.apply(p, x,
                                                       deterministic=True))

    lr_gain_z = float(args.inv_gain_z)
    niter = 30
    inv_cfg = inv_opt.InversionConfig(
        resolution=args.resolution,
        depth_samples_per_ray=config_lib.depth_samples(args),
        fine_sampling=args.fine_sampling,
        ray_multiplier=1 if args.fine_sampling else 4,
        scene_range=dataset_config['scene_range'],
        white_background=dataset_config['white_background'],
        camera_flipped=dataset_config['camera_flipped'],
        lr_gain_z=lr_gain_z,
        loss_type=args.inv_loss,
        optimize_pose=not args.inv_no_optimize_pose,
        use_pallas_warp=(args.use_pallas and args.resolution % 16 == 0
                         and jax.default_backend() == 'tpu'))

    lpips = LPIPS()
    lpips_vars = inv_cli.load_lpips_vars(args, lpips)

    num_ws = 14 + (1 if args.attention_values > 0 else 0)
    z_avg = np.asarray(
        gen.apply(gen_vars, jax.random.PRNGKey(1234), 10000,
                  method=Generator.average_w))
    z_avg = np.broadcast_to(z_avg, (1, num_ws, z_avg.shape[-1]))

    ctx = pipe.EvalContext(
        gen=gen, gen_vars=gen_vars, lpips=lpips, lpips_vars=lpips_vars,
        inception_apply=None,
        camera_flipped=dataset_config['camera_flipped'],
        has_mask=dataset_config['has_mask'],
        scene_range=dataset_config['scene_range'],
        attention_values=args.attention_values)

    focal_guesses = pnp.get_focal_guesses(focal)
    sel = np.arange(bs)
    sel_perm = np.arange(bs, 2 * bs)
    target_img = images[sel]
    target_img_fid = target_img
    target_img_random = images[sel_perm]
    # Perm cameras: re-derive the driver's look-at poses.
    from scripts.run_synthetic_inversion import look_at_poses
    poses = look_at_poses(rng, len(images), 2.1)
    gt_cam2world = poses[sel]
    perm_cameras = (poses[sel_perm], focal[sel_perm], None, None)

    def tick(label, t0):
        t1 = time.time()
        print(f'{label:<42s} {t1 - t0:8.2f} s', flush=True)
        return time.time()

    t = time.time()
    boot = pipe.bootstrap_batch(encoder, enc_params, target_img,
                                focal_guesses, jnp.asarray(z_avg),
                                lr_gain_z, args.inv_no_split,
                                encoder_apply)
    t = tick('bootstrap (encoder fwd + PnP) [compile]', t)
    if not scan_only:
        boot = pipe.bootstrap_batch(encoder, enc_params, target_img,
                                    focal_guesses, jnp.asarray(z_avg),
                                    lr_gain_z, args.inv_no_split,
                                    encoder_apply)
        t = tick('bootstrap steady', t)
    coords, mask, z_init, cam2world, focal_b, _ = boot
    params = pipe.init_inversion_params(z_init, cam2world, focal_b,
                                        dataset_config['camera_flipped'])

    report = pipe.make_report([0, niter])
    if not scan_only:
        for i in range(3):
            pipe.evaluate_checkpoint(
                ctx, inv_cfg, params, report[0], target_img_fid, None,
                None, gt_cam2world, perm_cameras=perm_cameras,
                target_img_random=target_img_random,
                compute_rot_error=False, valid=bs)
            t = tick(f'evaluate_checkpoint #{i}'
                     + (' [compile]' if i == 0 else ' steady'), t)

    run_scan = jax.jit(lambda p, tt, k, gt: inv_opt.run_inversion(
        gen, gen_vars, lpips, lpips_vars, p, tt, inv_cfg, niter,
        k, gt_cam2world=gt))
    key = jax.random.PRNGKey(0)
    trace_dir = None
    for a in sys.argv[1:]:
        if a.startswith('--trace='):
            trace_dir = a.split('=', 1)[1]
    for i in range(3):
        if trace_dir is not None and i == 2:
            jax.profiler.start_trace(trace_dir)
        out_params, scan_metrics = run_scan(
            params, jnp.asarray(target_img[..., :3]), key,
            jnp.asarray(gt_cam2world))
        jax.block_until_ready(out_params.z)
        if trace_dir is not None and i == 2:
            jax.profiler.stop_trace()
        t = tick(f'30-step scan #{i}'
                 + (' [compile]' if i == 0 else ' steady'), t)


if __name__ == '__main__':
    main()
