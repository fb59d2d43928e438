"""Inversion CLI: the --run_inversion workload end to end.

Mirrors /root/reference/run.py:1743-2404: config string + report dir,
encoder load-or-train, focal guesses, eval index/view permutations, the
batched loop (bootstrap -> PnP -> scan-refine -> per-checkpoint metrics),
mid-run report checkpointing every 512 images, and the final consolidated
report (+ optional demo strip export).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np


def compute_view_perm(target_img_indices, views_per_object,
                      rng: np.random.RandomState):
    """Matches each index to another view of the same object
    (run.py:443-474)."""
    if views_per_object == 1:
        return target_img_indices[rng.permutation(len(target_img_indices))]
    obj_index = {}
    for idx in target_img_indices:
        obj_index.setdefault(int(idx) // views_per_object, []).append(
            int(idx))
    perm = []
    for idx in target_img_indices:
        views = obj_index[int(idx) // views_per_object]
        if len(views) == 1:
            perm.append(views[0])
        else:
            while True:
                cand = views[rng.randint(len(views))]
                if cand != int(idx):
                    perm.append(cand)
                    break
    return np.asarray(perm)


def build_eval_indices(split, n_images_fid_max, views_per_object,
                       rng: np.random.RandomState):
    n = len(split.images)
    if n > n_images_fid_max:
        idx = np.sort(rng.permutation(n)[:n_images_fid_max])
    else:
        idx = np.arange(n)
    split.eval_indices = idx
    split.eval_indices_perm = compute_view_perm(idx, views_per_object, rng)


def select_inversion_targets(dataset_name, dataset_config, use_testset,
                             export_demo, train_split, train_eval_split,
                             split, sel, sel_perm):
    """Per-batch target selection (run.py:1874-1958). Two protocols:

    - testset: optimize AND evaluate on cropped test images (eval
      center/bbox None: the pose regressor is always in use,
      run.py:1746, 1906-1910); novel-view cameras come from the test
      split (p3d: train_eval, whose pose distribution stands in for the
      unavailable test poses, run.py:1895-1905).
    - train split: optimize on UNCROPPED train_split images (demo mode:
      cropped train_eval, run.py:1921-1926); evaluate the render with
      train_eval's bbox/center against the cropped train_eval image
      (ortho/CUB: uncropped train image, run.py:1928-1934); novel-view
      cameras and random-view targets come from train_eval.
    """
    vpo = dataset_config['views_per_object']
    if use_testset:
        target_img = split.images[sel]
        target_img_fid = target_img
        gt_cam2world = split.tform_cam2world[sel]
        target_center_fid = target_bbox_fid = None
        perm_split = (train_eval_split if 'p3d' in dataset_name else split)
        vpo_eff = dataset_config['views_per_object_test']
        target_img_random = (split.images[sel_perm] if vpo_eff > 1
                             else None)
    else:
        opt_split = train_eval_split if export_demo else train_split
        target_img = opt_split.images[sel]
        if dataset_config['camera_projection_model'] == 'ortho':
            target_img_fid = train_split.images[sel]  # uncropped
        else:
            target_img_fid = train_eval_split.images[sel]  # cropped
        gt_cam2world = train_split.tform_cam2world[sel]
        if export_demo:
            target_center_fid = target_bbox_fid = None
        else:
            target_center_fid = (None if train_eval_split.center is None
                                 else train_eval_split.center[sel])
            target_bbox_fid = (None if train_eval_split.bbox is None
                               else train_eval_split.bbox[sel])
        perm_split = train_eval_split
        vpo_eff = vpo
        target_img_random = (train_eval_split.images[sel_perm]
                             if vpo_eff > 1 else None)
    perm_cam = perm_split.tform_cam2world[sel_perm]
    perm_focal = (None if perm_split.focal_length is None
                  else perm_split.focal_length[sel_perm])
    perm_center = (None if perm_split.center is None
                   else perm_split.center[sel_perm])
    perm_bbox = (None if perm_split.bbox is None
                 else perm_split.bbox[sel_perm])
    return {
        'target_img': target_img,
        'target_img_fid': target_img_fid,
        'gt_cam2world': gt_cam2world,
        'target_center_fid': target_center_fid,
        'target_bbox_fid': target_bbox_fid,
        'target_img_random': target_img_random,
        'perm_cameras': (perm_cam, perm_focal, perm_center, perm_bbox),
    }


def run_inversion_cli(args, gan_cfg, dataset_config, state, train_split,
                      train_eval_split, test_split, mesh, report_dir,
                      experiment_name):
    import jax
    import jax.numpy as jnp

    from nerf_from_image_tpu import config as config_lib
    from nerf_from_image_tpu.invert import optimizer as inv_opt
    from nerf_from_image_tpu.invert import pipeline as pipe
    from nerf_from_image_tpu.invert import pnp
    from nerf_from_image_tpu.models.encoder import BootstrapEncoder
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.models.lpips import LPIPS
    from nerf_from_image_tpu.train import gan as gan_lib
    from nerf_from_image_tpu.utils import checkpoint as ckpt_lib
    from nerf_from_image_tpu.utils.logging import SummaryWriter

    use_testset = args.inv_use_testset
    lr_gain_z = args.inv_gain_z
    n_devices = len(mesh.devices.flatten())
    if args.inv_manual_input_path:
        batch_size = 1
    else:
        # Reference: batch_size // 4 * n_gpus (run.py:1757), with the
        # device count standing in for the GPU count.
        batch_size = max(args.batch_size // 4, 1) * n_devices

    # Config string (run.py:1760-1777).
    if args.dataset == 'p3d_car' and use_testset:
        split_str = ('imagenettest' if args.inv_use_imagenet_testset
                     else 'test')
    else:
        split_str = 'test' if use_testset else 'train'
    mode_str = '_separate' if args.inv_use_separate else '_joint'
    mode_str += '_nooptpose' if args.inv_no_optimize_pose else '_optpose'
    w_split_str = 'nosplit' if args.inv_no_split else 'split'
    cfg_xid = f'_{args.xid}' if args.xid else ''
    cfg_string = (f'i{cfg_xid}_{split_str}{mode_str}_{args.inv_loss}'
                  f'_gain{lr_gain_z}_{w_split_str}')
    print('Config string:', cfg_string)

    report_dir_eff = os.path.join(report_dir, args.resume_from or
                                  experiment_name, cfg_string)
    # Host-side artifacts (tensorboard, report files, demo strips) are
    # process-0 only on multi-host runs; every process computes the same
    # replicated values (parallel/distributed.py contract).
    from nerf_from_image_tpu.parallel import distributed as dist
    from nerf_from_image_tpu.utils import io as io_lib
    main_proc = dist.is_main_process()
    if main_proc:
        io_lib.mkdir(report_dir_eff)
    writer = SummaryWriter(report_dir_eff) if main_proc else None

    gen, _ = gan_lib.make_models(gan_cfg)
    gen_vars = state.ema_params_g

    # Encoder: load or train (run.py:1785-1808).
    encoder = BootstrapEncoder(latent_dim=args.latent_dim,
                               separate_backbones=args.inv_use_separate)
    coords_dir = os.path.join(args.root_path, 'coords_checkpoints',
                              args.resume_from or experiment_name)
    enc_ckpt = ckpt_lib.CheckpointManager(coords_dir)
    enc_params = None
    if args.coord_resume_from and args.coord_resume_from.endswith('.npz'):
        # Converted reference encoder checkpoint
        # (scripts/convert_weights.py --kind encoder -> encoder.npz).
        from nerf_from_image_tpu.utils.weights import load_npz_variables
        enc_params = load_npz_variables(args.coord_resume_from)
        assert enc_params is not None, \
            f'no converted encoder at {args.coord_resume_from}'
    elif args.coord_resume_from and enc_ckpt.exists(args.coord_resume_from):
        # Encoder checkpoints store the FULL EncoderTrainState (orbax
        # needs the matching target structure); inversion keeps only the
        # params.
        from nerf_from_image_tpu.train import encoder as enc_lib
        enc_cfg = enc_lib.EncoderConfig(
            resolution=args.resolution, latent_dim=args.latent_dim,
            depth_samples_per_ray=config_lib.depth_samples(args),
            fine_sampling=args.fine_sampling,
            scene_range=gan_cfg.scene_range,
            white_background=gan_cfg.white_background)
        target = jax.eval_shape(
            lambda k: enc_lib.init_train_state(k, encoder, enc_cfg),
            jax.random.PRNGKey(0))
        target = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), target)
        enc_params = enc_ckpt.restore(target,
                                      args.coord_resume_from).params
    else:
        from nerf_from_image_tpu.cli.train_encoder import \
            train_coord_regressor
        enc_params = train_coord_regressor(args, gan_cfg, gen, gen_vars,
                                           train_split, mesh, enc_ckpt,
                                           writer)
        if args.inv_train_coord_only:
            print('Exit after encoder training.')
            return

    focal_guesses = pnp.get_focal_guesses(train_split.focal_length)

    # Eval indices (run.py:413-499).
    rng = np.random.RandomState(1234)
    n_images_fid_max = 8000
    vpo = dataset_config['views_per_object']
    build_eval_indices(train_eval_split, n_images_fid_max, vpo, rng)
    if use_testset and test_split is not None:
        build_eval_indices(test_split, n_images_fid_max,
                           dataset_config['views_per_object_test'], rng)

    split = test_split if use_testset else train_eval_split
    image_indices = split.eval_indices
    image_indices_perm = split.eval_indices_perm

    if args.inv_export_demo_sample and not args.inv_manual_input_path:
        shuffle = np.random.RandomState(1).permutation(len(image_indices))
        image_indices = image_indices[shuffle]
        image_indices_perm = image_indices_perm[shuffle]

    if args.inv_encoder_only:
        checkpoint_steps = [0]
    elif args.inv_steps:
        checkpoint_steps = [0, args.inv_steps]
    elif lr_gain_z >= 10:
        checkpoint_steps = [0, 10]
    else:
        checkpoint_steps = [0, 30]
    niter = max(checkpoint_steps)

    inv_cfg = inv_opt.InversionConfig(
        resolution=args.resolution,
        depth_samples_per_ray=config_lib.depth_samples(args),
        fine_sampling=args.fine_sampling,
        ray_multiplier=1 if args.fine_sampling else 4,
        scene_range=dataset_config['scene_range'],
        white_background=dataset_config['white_background'],
        camera_flipped=dataset_config['camera_flipped'],
        lr_gain_z=float(lr_gain_z),
        loss_type=args.inv_loss,
        optimize_pose=not args.inv_no_optimize_pose,
        use_pallas_warp=(args.use_pallas and args.resolution % 16 == 0
                         and jax.default_backend() == 'tpu'))

    lpips = LPIPS()
    lpips_vars = load_lpips_vars(args, lpips)
    inception_apply = load_inception_apply(args)

    num_ws = 14 + (1 if args.attention_values > 0 else 0)
    z_avg = np.asarray(
        gen.apply(gen_vars, jax.random.PRNGKey(1234), 10000,
                  method=Generator.average_w))
    z_avg = np.broadcast_to(z_avg, (1, num_ws, z_avg.shape[-1]))

    ctx = pipe.EvalContext(
        gen=gen, gen_vars=gen_vars, lpips=lpips, lpips_vars=lpips_vars,
        inception_apply=inception_apply,
        camera_flipped=dataset_config['camera_flipped'],
        has_mask=dataset_config['has_mask'],
        scene_range=dataset_config['scene_range'],
        attention_values=args.attention_values)

    # Real-data Inception stats for fid_front/fid_random (run.py:385-413).
    if inception_apply is not None and not args.inv_export_demo_sample:
        cache_dir = os.path.join(args.root_path, 'fid_stats')
        train_eval_split.fid_stats = pipe.compute_real_fid_stats(
            train_eval_split.images, inception_apply, batch_size,
            os.path.join(cache_dir, f'fid_stats_{args.dataset}_train.npz'))
        if use_testset and test_split is not None:
            test_split.fid_stats = pipe.compute_real_fid_stats(
                test_split.images, inception_apply, batch_size,
                os.path.join(cache_dir,
                             f'fid_stats_{args.dataset}_test.npz'))

    report = pipe.make_report(checkpoint_steps)
    encoder_apply = jax.jit(lambda p, x: encoder.apply(p, x,
                                                       deterministic=True))

    run_scan = None
    if niter > 0:
        run_scan = jax.jit(lambda p, t, k, gt: inv_opt.run_inversion(
            gen, gen_vars, lpips, lpips_vars, p, t, inv_cfg, niter, k,
            gt_cam2world=gt))

    idx = 0
    key = jax.random.PRNGKey(4321)
    # Mid-run resume (run.py:1858-1871).
    report_ckpt_path = os.path.join(report_dir_eff, 'report_checkpoint.npz')
    if not args.inv_export_demo_sample:
        idx, saved_key = pipe.load_report_checkpoint(report_ckpt_path,
                                                     report)
        if saved_key is not None:
            key = jnp.asarray(saved_key)
        if idx:
            print(f'Resumed inversion report at image {idx}')
    def slice_batch(at):
        sel = image_indices[at:at + batch_size]
        sel_perm = image_indices_perm[at:at + batch_size]
        if len(sel) < batch_size:
            # Straggler: pad to batch, mask out extras at report time.
            pad = batch_size - len(sel)
            sel = np.concatenate([sel, sel[-1:].repeat(pad)])
            sel_perm = np.concatenate([sel_perm, sel_perm[-1:].repeat(pad)])
            return sel, sel_perm, len(image_indices) - at
        return sel, sel_perm, batch_size

    def targets_at(at):
        sel, sel_perm, valid = slice_batch(at)
        return select_inversion_targets(
            args.dataset, dataset_config, use_testset,
            args.inv_export_demo_sample, train_split, train_eval_split,
            split, sel, sel_perm), valid

    boot = None  # bootstrap result prefetched by the previous iteration
    while idx < len(image_indices):
        t1 = time.time()
        tsel, valid = targets_at(idx)
        target_img = tsel['target_img']
        target_img_fid = tsel['target_img_fid']
        gt_cam2world = tsel['gt_cam2world']
        target_center_fid = tsel['target_center_fid']
        target_bbox_fid = tsel['target_bbox_fid']
        target_img_random = tsel['target_img_random']
        perm_cam, perm_focal, perm_center, perm_bbox = tsel['perm_cameras']

        # Bootstrap: encoder (device) + PnP (host). Usually prefetched by
        # the previous iteration so the PnP overlapped that batch's scan.
        if boot is None:
            coords, mask, z_init, cam2world, focal, _ = \
                pipe.bootstrap_batch(
                    encoder, enc_params, target_img, focal_guesses,
                    jnp.asarray(z_avg), float(lr_gain_z),
                    args.inv_no_split, encoder_apply)
        else:
            coords, mask, z_init, cam2world, focal, _ = boot
            boot = None
        params = pipe.init_inversion_params(
            z_init, cam2world, focal, dataset_config['camera_flipped'])

        # Dispatch the NEXT batch's encoder forward BEFORE this batch's
        # device-heavy work: the device finishes it first, so the host
        # PnP below can run while the refinement scan executes
        # (SURVEY §7.3.5 overlap).
        enc_out_next = None
        if (idx + valid < len(image_indices) and
                not args.inv_export_demo_sample):
            ntsel, _ = targets_at(idx + valid)
            enc_out_next = pipe.bootstrap_dispatch(
                encoder_apply, enc_params, ntsel['target_img'])

        if 0 in report:
            pipe.evaluate_checkpoint(
                ctx, inv_cfg, params, report[0], target_img_fid,
                target_center_fid, target_bbox_fid, gt_cam2world,
                perm_cameras=(perm_cam, perm_focal, perm_center, perm_bbox),
                target_img_random=target_img_random,
                compute_rot_error=not (args.dataset == 'p3d_car' and
                                       use_testset),
                valid=valid)

        if niter > 0:
            key, sub = jax.random.split(key)
            first_batch = (idx == 0)
            # Async dispatch: the scan occupies the device while the
            # next batch's PnP runs on the host just below.
            params, scan_metrics = run_scan(
                params, jnp.asarray(target_img[..., :3]), sub,
                jnp.asarray(gt_cam2world))
            if enc_out_next is not None:
                boot = pipe.bootstrap_finish(
                    enc_out_next, focal_guesses, jnp.asarray(z_avg),
                    float(lr_gain_z), args.inv_no_split)
                enc_out_next = None
            if first_batch:
                # First-batch per-step telemetry, reference tag names
                # (run.py:2288-2306) plus per-param grad norms.
                sm = {k: np.asarray(v) for k, v in scan_metrics.items()}
                for it in range(niter):
                    writer.add_scalar('monitor_b0/psnr',
                                      float(sm['psnr'][it]), it)
                    writer.add_scalar('monitor_b0/lpips',
                                      float(sm['lpips'][it]), it)
                    if 'rot_error' in sm:
                        writer.add_scalar('monitor_b0/rot_error',
                                          float(sm['rot_error'][it]), it)
                    for pname in ('z', 'f', 'R', 's', 't'):
                        gkey = f'grad_norm_{pname}'
                        if gkey in sm:
                            writer.add_scalar(f'monitor_b0/{gkey}',
                                              float(sm[gkey][it]), it)
            pipe.evaluate_checkpoint(
                ctx, inv_cfg, params, report[niter], target_img_fid,
                target_center_fid, target_bbox_fid, gt_cam2world,
                perm_cameras=(perm_cam, perm_focal, perm_center, perm_bbox),
                target_img_random=target_img_random,
                compute_rot_error=not (args.dataset == 'p3d_car' and
                                       use_testset),
                valid=valid)

        if enc_out_next is not None:
            # niter == 0 path: finish the prefetch before moving on.
            boot = pipe.bootstrap_finish(
                enc_out_next, focal_guesses, jnp.asarray(z_avg),
                float(lr_gain_z), args.inv_no_split)

        t2 = time.time()
        idx += valid
        print(f'[{idx}/{len(image_indices)}] batch in {t2 - t1:.2f} s '
              f'({(t2 - t1) / valid:.2f} s/img)')

        if args.inv_export_demo_sample:
            if main_proc:
                export_demo(args, ctx, inv_cfg, params, target_img, coords,
                            mask, dataset_config, niter, mesh=mesh)
            break

        if (idx % 512 == 0 and main_proc
                and not args.inv_export_demo_sample):
            pipe.save_report_checkpoint(report_ckpt_path, report, idx,
                                        np.asarray(key))

    if not args.inv_export_demo_sample:
        report, report_str = pipe.consolidate_report(
            report, train_eval_split.fid_stats,
            test_split.fid_stats if use_testset and test_split is not None
            else None, writer=writer)
        if main_proc:
            print(report_str)
            pipe.save_report(report, report_str, report_dir_eff,
                             header=f'{args.resume_from}\n{cfg_string}')


def load_lpips_vars(args, lpips):
    """Loads converted LPIPS weights ({root_path}/weights/lpips.npz, the
    asset scripts/convert_weights.py --kind lpips writes) if present,
    else random init (parity requires the converted weights; random is
    only a fallback so the pipeline runs without the asset)."""
    import jax
    import jax.numpy as jnp
    from nerf_from_image_tpu.utils.weights import load_npz_variables

    path = os.path.join(args.root_path, 'weights', 'lpips.npz')
    variables = load_npz_variables(path)
    if variables is not None:
        return variables
    print('WARNING: LPIPS weights not found at', path,
          '- using random init (convert with scripts/convert_weights.py)')
    return jax.jit(lpips.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 3, 64, 64)),
                               jnp.zeros((1, 3, 64, 64)))


def load_inception_apply(args):
    """Jitted FID-Inception activations from
    {root_path}/weights/inception.npz (scripts/convert_weights.py --kind
    inception); FID reporting is disabled without the asset."""
    import jax
    from nerf_from_image_tpu.models.inception import InceptionV3FID
    from nerf_from_image_tpu.utils.weights import load_npz_variables

    path = os.path.join(args.root_path, 'weights', 'inception.npz')
    variables = load_npz_variables(path)
    if variables is None:
        print('WARNING: Inception weights not found at', path,
              '- FID reporting disabled')
        return None
    net = InceptionV3FID()
    return jax.jit(lambda x: net.apply(variables, x))


def export_demo(args, ctx, inv_cfg, params, target_img, coords, mask,
                dataset_config, it, mesh=None):
    """Exports the side-by-side demo strip
    [input | coords | recon | normals | novel view] (run.py:2058-2159)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nerf_from_image_tpu.core import pose as pose_utils
    from nerf_from_image_tpu.invert import optimizer as inv_opt
    from nerf_from_image_tpu.parallel import mesh as mesh_lib

    # Demo renders are batch-1: with a 'rays' mesh axis
    # (--mesh_shape data:1,rays:N) the image rows are sharded instead.
    ray_sharding = (mesh_lib.ray_spec(mesh)
                    if mesh is not None and 'rays' in mesh.axis_names
                    else None)

    out, cam, focal = inv_opt.render_from_params(
        ctx.gen, ctx.gen_vars, params, inv_cfg,
        compute_normals=args.use_sdf, ray_sharding=ray_sharding)
    recon = np.asarray(jnp.clip(out.rgb, -1, 1))

    strips = [np.asarray(target_img)[..., :3]]
    if coords is not None:
        coords_img = coords * mask[..., None] / dataset_config['scene_range']
        coords_img = np.clip(coords_img, -1, 1)
        if dataset_config['white_background']:
            coords_img = coords_img + (1 - mask[..., None])
        strips.append(coords_img)
    strips.append(recon)
    if out.normals is not None:
        strips.append(np.asarray(jnp.clip(out.normals, -1, 1)))

    # Novel view: the recovered camera rotated ~50 degrees about the
    # world up-axis (run.py:2141-2159 renders a second viewpoint of the
    # same inverted object).
    angle = np.deg2rad(50.0)
    rot = np.asarray([[np.cos(angle), 0, np.sin(angle), 0],
                      [0, 1, 0, 0],
                      [-np.sin(angle), 0, np.cos(angle), 0],
                      [0, 0, 0, 1]], np.float32)
    cam_novel = jnp.asarray(rot)[None] @ cam
    out_novel, _, _ = inv_opt.render_from_params(
        ctx.gen, ctx.gen_vars, params, inv_cfg, override_cam=cam_novel,
        ray_sharding=ray_sharding)
    strips.append(np.asarray(jnp.clip(out_novel.rgb, -1, 1)))
    strip = np.concatenate(strips, axis=2) / 2 + 0.5

    os.makedirs('outputs', exist_ok=True)
    name = ('demo_manual' if args.inv_manual_input_path else 'sample')
    out_path = os.path.join('outputs', f'{name}_{args.dataset}_{it}it.png')
    from PIL import Image
    img8 = (np.clip(strip.reshape(-1, strip.shape[2], 3), 0, 1) *
            255).astype(np.uint8)
    Image.fromarray(img8).save(out_path)
    print('Saved demo output to', out_path)
