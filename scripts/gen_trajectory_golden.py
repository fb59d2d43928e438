"""Generates the reference-trajectory parity golden (VERDICT r2 next #1).

Runs the REAL /root/reference/run.py (via scripts/ref_runner.py) for 3
GAN training iterations (G, D+R1, G) on a synthetic CARLA-format fixture
with a narrow-channel model, capturing:
- the init checkpoint (built here, loaded by run.py via --resume_from),
- every RNG draw (substituted with numpy-seeded values; see ref_runner),
- the per-iteration tensorboard scalars (loss/g, grad_norm/g,
  loss/eikonal, loss/tv, loss/entropy, sdf/{alpha,beta}, loss/d_real,
  loss/d_fake, loss/r1, grad_norm/d).

tests/test_reference_trajectory.py replays the identical trajectory
through the rebuild's jitted g_step/d_step (converted init weights +
injected noise) and asserts the scalar trajectories match. Reference
semantics exercised end-to-end: run.py:947-1193 (G/D steps), 872-905
(resume), 662-676 (no lr warmup on resume).

Usage:
  python scripts/gen_trajectory_golden.py            # base 3-iter tape
  python scripts/gen_trajectory_golden.py stateful   # stateful-branch tape
Writes tests/golden/trajectory_gan[_stateful].npz.

The `stateful` tape covers the training branches SURVEY §7.3.6 ranks as
parity minefields (VERDICT r3 next #7): 8 iterations (4 G + 4 D)
resumed at iteration 12504 — past the blur/lr warmups, so PPL runs at
full weight (run.py:1029-1043), the ADA controller updates at
i % 8 == 7 (run.py:1147-1163), per-layer StyleGAN noise is enabled
(--disable_stylegan_noise '', noise_strength seeded nonzero so the
draws matter), and ADA augmentation is live from the start via the
resume quirk (run.py:902-903 checks key 'augment_p_effective' but READS
key 'augment_p' — the checkpoint carries both).
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get('REF_PATH', '/root/reference')
STUBS = os.path.join(REPO, 'scripts', 'ref_stubs')

# Trajectory config (mirrored exactly by the rebuild test).
CFG = dict(
    dataset='carla',
    n_images=8,
    resolution=16,
    batch_size=4,
    latent_dim=64,
    iterations=3,
    channel_base=2048,
    channel_max=64,
    lr_g=0.0025,
    lr_d=0.002,
    r1=5.0,
    tv=0.5,
    entropy=0.05,
    eikonal=0.1,
    scene_range=3.0,
    white_background=True,
    focal_px=19.2,  # focal in pixels at 16px -> normalized 1.2
)


def make_dataset(data_dir, rng, res=None, n_images=None, focal_px=None):
    """Synthetic CARLA-format fixture: pngs + per-image extrinsics +
    shared intrinsics (reference data/datasets.py:718-760)."""
    from PIL import Image
    carla = os.path.join(data_dir, 'carla')
    poses_dir = os.path.join(carla, 'carla_poses')
    os.makedirs(poses_dir)
    res = res if res is not None else CFG['resolution']
    n_images = n_images if n_images is not None else CFG['n_images']
    focal_px = focal_px if focal_px is not None else CFG['focal_px']

    images_u8 = rng.randint(0, 256, (n_images, res, res, 3),
                            dtype=np.uint8)
    poses = []
    for i in range(n_images):
        Image.fromarray(images_u8[i]).save(
            os.path.join(carla, f'{i:04d}.png'))
        # Camera on a jittered ring at radius 10 looking at the origin.
        theta = 2 * np.pi * i / n_images + rng.uniform(-0.1, 0.1)
        phi = rng.uniform(0.2, 0.7)
        eye = 10.0 * np.array([np.cos(theta) * np.cos(phi),
                               np.sin(phi),
                               np.sin(theta) * np.cos(phi)])
        z_axis = eye / np.linalg.norm(eye)  # camera +z away from target
        up = np.array([0.0, 1.0, 0.0])
        x_axis = np.cross(up, z_axis)
        x_axis /= np.linalg.norm(x_axis)
        y_axis = np.cross(z_axis, x_axis)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = (
            x_axis, y_axis, z_axis, eye)
        poses.append(c2w)
        np.save(os.path.join(poses_dir, f'{i:04d}_extrinsics.npy'),
                c2w[:3].astype(np.float32))
    intr = np.zeros((1, 1, 3, 3), np.float32)
    intr[0, 0, 0, 0] = focal_px
    intr[0, 0, 0, 2] = res / 2
    intr[0, 0, 1, 2] = res / 2
    np.save(os.path.join(poses_dir, 'intrinsics.npy'), intr)

    images_f = images_u8.astype(np.float32) / 255.0 * 2.0 - 1.0
    return images_f, np.stack(poses), np.float32(focal_px / res)


def build_init_checkpoint(path, channel_base=None, channel_max=None,
                          latent_dim=None, resolution=None,
                          disable_stylegan_noise=True, iteration=0,
                          augment_p=None, use_encoder=False):
    """Init checkpoint in the reference's on-disk format, with the same
    narrow-channel surgery ref_runner applies (run.py loads it via
    --resume_from, restoring weights + fresh Adam states +
    the given iteration; resume also disables lr warmup, run.py:668-676).

    disable_stylegan_noise=False builds the noise-bearing generator and
    seeds every noise_strength to a deterministic NONZERO value (they
    init to 0, which would make injected noise vacuous). augment_p seeds
    the ADA probability via the reference's resume quirk."""
    sys.path.insert(0, STUBS)
    sys.path.insert(0, REF)
    import torch
    from models import stylegan as ref_sg

    cb = channel_base if channel_base is not None else CFG['channel_base']
    cm = channel_max if channel_max is not None else CFG['channel_max']
    latent_dim = latent_dim if latent_dim is not None else CFG['latent_dim']
    resolution = resolution if resolution is not None else CFG['resolution']

    def narrowed(cls):
        class Narrow(cls):
            def __init__(self, *a, **kw):
                kw.setdefault('channel_base', cb)
                kw.setdefault('channel_max', cm)
                super().__init__(*a, **kw)
        return Narrow

    ref_sg.SynthesisNetwork = narrowed(ref_sg.SynthesisNetwork)
    ref_sg.DiscriminatorBackbone = narrowed(ref_sg.DiscriminatorBackbone)

    from models import generator as ref_gen
    from models import discriminator as ref_disc
    from data import loaders as ref_loaders
    if not hasattr(ref_disc, 'ResidualEncoder'):
        # Upstream bug: discriminator.py:38 uses ResidualEncoder without
        # importing it (defined in models/generator.py; the 512-D c_dim
        # accounting matches). Inject the intended name.
        ref_disc.ResidualEncoder = ref_gen.ResidualEncoder

    torch.manual_seed(99)
    dataset_config = ref_loaders.get_dataset_config(CFG['dataset'])
    model = ref_gen.Generator(latent_dim,
                              dataset_config['scene_range'],
                              attention_values=10,
                              use_viewdir=False,
                              use_encoder=use_encoder,
                              disable_stylegan_noise=disable_stylegan_noise,
                              use_sdf=True,
                              num_classes=None)
    if not disable_stylegan_noise:
        with torch.no_grad():
            k = 0
            for name, p in sorted(model.named_parameters()):
                if name.endswith('noise_strength'):
                    p.fill_(0.05 * (k + 1))
                    k += 1
    disc = ref_disc.Discriminator(resolution, nc=3,
                                  dataset_config=dataset_config,
                                  conditional_pose=True,
                                  use_encoder=use_encoder, num_classes=None)
    opt_g = torch.optim.Adam(list(model.parameters()), lr=CFG['lr_g'],
                             betas=(0., 0.99))
    opt_d = torch.optim.Adam(list(disc.parameters()), lr=CFG['lr_d'],
                             betas=(0., 0.99))
    ckpt = {
        'model': model.state_dict(),
        'model_ema': model.state_dict(),
        'discriminator': disc.state_dict(),
        'optimizer_g': opt_g.state_dict(),
        'optimizer_d': opt_d.state_dict(),
        'iteration': iteration,
        'lr_g': CFG['lr_g'],
        'lr_d': CFG['lr_d'],
    }
    if augment_p is not None:
        # run.py:902-903: `if 'augment_p_effective' in resume_from:
        # augment_p_effective = resume_from['augment_p']` — the presence
        # key and the value key differ; carry both.
        ckpt['augment_p_effective'] = augment_p
        ckpt['augment_p'] = augment_p
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'wb') as f:
        torch.save(ckpt, f)
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}, \
        {k: v.detach().numpy() for k, v in disc.state_dict().items()}


def read_tb_scalars(log_root):
    from tensorboard.backend.event_processing import event_accumulator
    dirs = [d for d in os.listdir(log_root)
            if os.path.isdir(os.path.join(log_root, d))]
    assert len(dirs) == 1, f'expected one experiment dir, got {dirs}'
    acc = event_accumulator.EventAccumulator(
        os.path.join(log_root, dirs[0]),
        size_guidance={event_accumulator.SCALARS: 0})
    acc.Reload()
    out = {}
    for tag in acc.Tags()['scalars']:
        out[tag] = [(ev.step, ev.value) for ev in acc.Scalars(tag)]
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else 'base'
    assert mode in ('base', 'stateful', 'eval', 'pretrain')
    stateful = mode == 'stateful'

    work = tempfile.mkdtemp(prefix='traj_golden_')
    data_dir = os.path.join(work, 'data')
    root_dir = os.path.join(work, 'root')
    os.makedirs(data_dir)
    os.makedirs(root_dir)

    cfg = dict(CFG)
    cfg['mode'] = mode
    if stateful:
        # Resume past every warmup: blur off, tv/entropy warm = 1,
        # pl_weight = 2 (full), ADA controller live; 8 iterations hits
        # the i % 8 == 7 ADA update at 12511 (run.py:1147-1163).
        cfg.update(start_iteration=12504, iterations=12512,
                   augment_p=0.8, augment_p_init=0.5,
                   path_length_regularization=True, augment_ada=True,
                   stylegan_noise=True)
    elif mode == 'eval':
        # 4 iterations hit the i == 3 smoke eval (run.py:1195-1197):
        # encoder mode so evaluate() runs its full surface — frozen FID
        # stats, recon_front (PSNR/SSIM/LPIPS) + recon_random over the
        # seeded eval indices/perm, FID Frechet, best_fid gating
        # (run.py:1197-1406, 1511-1513).
        cfg.update(iterations=4, use_encoder=True)
    elif mode == 'pretrain':
        # Fresh run (no --resume_from -> pretrain_sdf runs, run.py:821):
        # 1000 pretrain Adam steps + 2 training iterations whose scalars
        # transitively pin the pretrained weights. Init is forced via
        # REF_FORCE_INIT (module init uses tensor methods the RNG
        # substitution cannot see).
        cfg.update(iterations=2, fresh=True)

    rng = np.random.RandomState(515)
    images, poses, focal = make_dataset(data_dir, rng)

    ckpt_rel = os.path.join('trajinit', 'init.pth')
    ckpt_abs = os.path.join(root_dir, 'gan_checkpoints', ckpt_rel)
    g_sd, d_sd = build_init_checkpoint(
        ckpt_abs,
        disable_stylegan_noise=not cfg.get('stylegan_noise', False),
        iteration=cfg.get('start_iteration', 0),
        augment_p=cfg.get('augment_p_init'),
        use_encoder=cfg.get('use_encoder', False))

    tape_path = os.path.join(work, 'tape.json')
    env = dict(os.environ)
    env.update({
        'PYTORCH_JIT': '0',
        'REF_TAPE_OUT': tape_path,
        'REF_CHANNEL_BASE': str(CFG['channel_base']),
        'REF_CHANNEL_MAX': str(CFG['channel_max']),
        'REF_NO_DATASET_OVERRIDES': '1',
        'REF_PATH': REF,
        'CUDA_VISIBLE_DEVICES': '',
    })
    cmd = [sys.executable, os.path.join(REPO, 'scripts', 'ref_runner.py'),
           '--dataset', CFG['dataset'],
           '--data_path', data_dir,
           '--root_path', root_dir,
           '--gpus', '0',
           '--batch_size', str(CFG['batch_size']),
           '--iterations', str(cfg['iterations']),
           '--latent_dim', str(CFG['latent_dim']),
           '--resolution', str(CFG['resolution'])]
    if cfg.get('fresh'):
        env['REF_FORCE_INIT'] = ckpt_abs
        env['REF_TAP_PRINTS'] = '1'
    else:
        cmd += ['--resume_from', ckpt_rel]
    if stateful:
        # type=bool flag: empty string -> False (arguments.py:150-153).
        cmd += ['--path_length_regularization', '--augment_ada',
                '--augment_p', str(cfg['augment_p']),
                '--disable_stylegan_noise', '']
        env['REF_TAP_AUGMENT'] = '1'
        env['REF_TAP_SPLITS'] = '1'
    if mode == 'eval':
        cmd += ['--use_encoder']
        env['REF_TAP_SPLITS'] = '1'
    print('Running reference:', ' '.join(cmd))
    subprocess.run(cmd, check=True, env=env, cwd=REPO)

    scalars = read_tb_scalars(os.path.join(root_dir, 'gan_logs'))
    with open(tape_path) as f:
        tape = json.load(f)

    out = {
        'images': images,
        'poses': poses,
        'focal': focal,
        'config_json': np.str_(json.dumps(cfg)),
        'tape_json': np.str_(json.dumps(tape)),
        'scalars_json': np.str_(json.dumps(scalars)),
    }
    for k, v in g_sd.items():
        out[f'init_g/{k}'] = v
    for k, v in d_sd.items():
        out[f'init_d/{k}'] = v

    dest = os.path.join(
        REPO, 'tests', 'golden',
        {'base': 'trajectory_gan.npz',
         'stateful': 'trajectory_gan_stateful.npz',
         'eval': 'trajectory_gan_eval.npz',
         'pretrain': 'trajectory_pretrain.npz'}[mode])
    np.savez_compressed(dest, **out)
    print('Wrote', dest, f'({len(out)} arrays)')
    shutil.rmtree(work)


if __name__ == '__main__':
    main()
