"""Dataset-scale synthetic inversion run (VERDICT r4 next #2).

Executes the FULL --run_inversion protocol through
cli/inversion.py::run_inversion_cli — encoder bootstrap -> PnP ->
30-step scan refinement, encoder/PnP <-> scan overlap, per-checkpoint
metrics, the 512-image report checkpoint, mid-run resume, and the final
consolidated report.txt — at p3d_car scale (reference protocol
run.py:1743-2404), with synthetic targets rendered from the random-init
GAN itself (no dataset files exist in this container; the throughput
and plumbing are what this run measures, not reconstruction quality).

Usage:
  python scripts/run_synthetic_inversion.py [n_images] [--workdir=DIR]
  NFI_SYNTH_STOP_AFTER_CKPT=1 python scripts/run_synthetic_inversion.py
      # exits right after the first 512-image report checkpoint; a
      # second invocation with the same --workdir resumes mid-run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def look_at_poses(rng: np.random.RandomState, n: int, distance: float):
    """Cameras on a sphere looking at the origin (y-up), c2w 4x4."""
    azim = rng.uniform(-np.pi, np.pi, size=n)
    elev = rng.uniform(-0.3, 0.6, size=n)
    eye = np.stack([
        np.cos(elev) * np.sin(azim),
        np.sin(elev),
        np.cos(elev) * np.cos(azim),
    ], axis=-1) * distance
    fwd = -eye / np.linalg.norm(eye, axis=-1, keepdims=True)
    up = np.broadcast_to(np.array([0.0, 1.0, 0.0]), fwd.shape)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right, axis=-1, keepdims=True)
    true_up = np.cross(right, fwd)
    pose = np.zeros((n, 4, 4), np.float32)
    # OpenGL-style camera: -z forward (matches the ray-gen convention
    # for camera_flipped datasets after the flip).
    pose[:, :3, 0] = right
    pose[:, :3, 1] = true_up
    pose[:, :3, 2] = -fwd
    pose[:, :3, 3] = eye
    pose[:, 3, 3] = 1.0
    return pose


def main():
    positional = [a for a in sys.argv[1:] if not a.startswith('--')]
    n_images = int(positional[0]) if positional else 640
    workdir = '/tmp/nfi_synth_inv'
    for a in sys.argv[1:]:
        if a.startswith('--workdir='):
            workdir = a.split('=', 1)[1]
    os.makedirs(workdir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from nerf_from_image_tpu import config as config_lib
    from nerf_from_image_tpu.cli import inversion as inv_cli
    from nerf_from_image_tpu.data.loaders import DatasetSplit
    from nerf_from_image_tpu.models.encoder import BootstrapEncoder
    from nerf_from_image_tpu.models.generator import Generator
    from nerf_from_image_tpu.parallel import mesh as mesh_lib
    from nerf_from_image_tpu.render import render
    from nerf_from_image_tpu.train import gan as gan_lib
    from nerf_from_image_tpu.utils.weights import save_npz_variables

    args = config_lib.parse_args([
        '--dataset', 'p3d_car', '--run_inversion',
        '--root_path', workdir, '--batch_size', '32',
    ])
    config_lib.override_default_args(args)  # p3d: inv_use_testset etc.
    dataset_config = config_lib.get_dataset_config(args.dataset)
    mesh = mesh_lib.create_mesh(args.mesh_shape)

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

    print('Initializing random GAN state...')
    state = jax.jit(lambda k: gan_lib.init_train_state(k, cfg))(
        jax.random.PRNGKey(1234))
    gen, _ = gan_lib.make_models(cfg)
    # run_inversion_cli reads only state.ema_params_g; drop the D params
    # and both Adam moment trees so they don't occupy HBM for the whole
    # run (the 30-step refinement scan at batch 8 needs the headroom).
    ema = state.ema_params_g

    class _EmaOnly:
        ema_params_g = ema

    del state
    state = _EmaOnly()

    # ---- Synthetic targets: renders of the random-init EMA generator
    # at frame-filling p3d-like cameras (object ~76 px of 128).
    rng = np.random.RandomState(4242)
    distance = 2.1
    poses = look_at_poses(rng, n_images, distance)
    focal = np.full((n_images,), 1.2, np.float32)
    z_all = rng.randn(n_images, cfg.latent_dim).astype(np.float32)

    bs = 8

    @jax.jit
    def render_batch(params, z, pose, focal):
        ws = gen.apply(params, z, method=Generator.map)
        gstate = gen.apply(params, ws, method=Generator.synthesize)

        def sample_fn(pts, reqs):
            return gen.apply(params, gstate, pts, reqs,
                             method=Generator.sample)

        out = render(sample_fn, cfg.resolution, cfg.resolution, pose,
                     focal, None, None, cfg.scene_range,
                     cfg.white_background, cfg.depth_samples_per_ray,
                     rng=None, fine_sampling=cfg.fine_sampling,
                     force_no_cam_grad=True)
        rgb = jnp.clip(out.rgb, -1, 1)
        alpha = jnp.clip(out.mask, 0, 1)[..., None] * 2.0 - 1.0
        return jnp.concatenate([rgb, alpha], axis=-1)

    cache = os.path.join(workdir, f'targets_{n_images}.npz')
    if os.path.exists(cache):
        images = np.load(cache)['images']
        print(f'Loaded {len(images)} cached synthetic targets')
    else:
        print(f'Rendering {n_images} synthetic targets...')
        t0 = time.time()
        chunks = []
        for i in range(0, n_images, bs):
            pose_b = jnp.asarray(poses[i:i + bs])
            z_b = jnp.asarray(z_all[i:i + bs])
            f_b = jnp.asarray(focal[i:i + bs])
            chunks.append(np.asarray(render_batch(
                state.ema_params_g, z_b, pose_b, f_b), np.float32))
        images = np.concatenate(chunks, 0)
        np.savez(cache, images=images)
        print(f'  rendered in {time.time() - t0:.1f} s')
    # Drop the target-render executable + its buffers before the
    # inversion graphs compile (HBM headroom).
    jax.clear_caches()

    test_split = DatasetSplit(images=images, tform_cam2world=poses,
                              focal_length=focal)
    train_eval_split = DatasetSplit(images=images, tform_cam2world=poses,
                                    focal_length=focal)
    train_split = DatasetSplit(images=images, tform_cam2world=poses,
                               focal_length=focal)

    # Random-init bootstrap encoder saved as a converted-npz checkpoint
    # (the CLI's --coord_resume_from .npz path) so run_inversion_cli
    # skips its 120k-step encoder training.
    enc_npz = os.path.join(workdir, 'encoder_random.npz')
    if not os.path.exists(enc_npz):
        encoder = BootstrapEncoder(latent_dim=args.latent_dim,
                                   separate_backbones=args.inv_use_separate)
        enc_params = jax.jit(encoder.init)(
            jax.random.PRNGKey(7),
            jnp.zeros((1, 3, args.resolution, args.resolution)))
        save_npz_variables(enc_params, enc_npz)
    args.coord_resume_from = enc_npz

    if os.environ.get('NFI_SYNTH_STOP_AFTER_CKPT') == '1':
        from nerf_from_image_tpu.invert import pipeline as pipe
        orig_save = pipe.save_report_checkpoint

        def save_and_stop(path, report, idx, key):
            orig_save(path, report, idx, key)
            print(f'NFI_SYNTH_STOP_AFTER_CKPT: exiting after the '
                  f'{idx}-image report checkpoint (resume by rerunning)')
            os._exit(0)

        pipe.save_report_checkpoint = save_and_stop

    t0 = time.time()
    inv_cli.run_inversion_cli(args, cfg, dataset_config, state,
                              train_split, train_eval_split, test_split,
                              mesh, os.path.join(workdir, 'reports'),
                              'synthinv')
    dt = time.time() - t0
    print(f'TOTAL inversion wall-clock: {dt:.1f} s for {n_images} images '
          f'-> {dt / n_images:.2f} s/img (excl. target generation)')


if __name__ == '__main__':
    main()
