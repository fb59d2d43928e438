"""Generates the encoder-distillation trajectory parity golden
(VERDICT r3 missing #2).

Runs the REAL /root/reference/run.py coord-regressor training loop
(run.py:1521-1706) for 3 iterations on a synthetic CARLA-format fixture:
a narrow-channel GAN init checkpoint supplies the frozen EMA render
targets, and a narrow-backbone BootstrapEncoder checkpoint (resumed at
iteration 119997 so the hardcoded max_iters=120000 loop runs exactly 3
steps) is trained with the reference's Adam(6e-5). Captured:
- every RNG draw (substituted seeded values; scripts/ref_runner.py):
  the EndlessSampler permutations (utils.py:180-189), the per-step z
  (run.py:1630), and the EMA render's stratified-depth + sample_pdf
  draws (nerf_utils.py:115, 202),
- the per-step writer scalars coord_regressor/loss_{coords,mask,latent}
  (run.py:1666-1675), taped directly from add_scalar because
  --inv_train_coord_only exits via sys.exit before the event file
  flushes (run.py:1806-1807),
- the final trained checkpoint (model_coord + optimizer_coord), for
  post-3-step weight/Adam-moment assertions.

Stochastic depth is disabled for the tape (REF_SEG_DROP_PATH=0):
SegDropPath draws via Tensor.bernoulli_ (segformer.py:29-36), which
bypasses the torch.rand taps; the drop-path mechanism itself is
parity-tested at module level (tests/test_train_encoder.py).

tests/test_encoder_trajectory.py replays the identical trajectory
through the rebuild's jitted train/encoder.py::train_step.

Usage: python scripts/gen_encoder_golden.py
Writes tests/golden/trajectory_encoder.npz.
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_trajectory_golden import (CFG as GAN_CFG, build_init_checkpoint,
                                   make_dataset)

# Trajectory config (mirrored exactly by the rebuild test).
CFG = dict(
    dataset='carla',
    n_images=8,
    resolution=16,
    batch_size=4,  # run.py:1526: encoder training uses args.batch_size
    latent_dim=512,  # w-space dim is fixed at 512 and the latent head
    # regresses w (run.py:1663: criterion_latent(pred_w, w[:, :1])), so
    # latent_dim must match (same constraint as the inversion tape)
    iterations=3,
    start_iteration=120000 - 3,  # max_iters is hardcoded (run.py:1676)
    channel_base=GAN_CFG['channel_base'],
    channel_max=GAN_CFG['channel_max'],
    lr=0.00006,  # run.py:1570
    scene_range=3.0,
    white_background=True,
    focal_px=19.2,
    # Narrow SegFormer backbone (reference constructor kwargs; the
    # 512-wide encoder heads are hardcoded, encoder.py:35-66).
    seg_embed_dims=(8, 16, 32, 32),
    seg_depths=(1, 1, 2, 1),
    seg_num_heads=(1, 2, 4, 4),
    seg_sr_ratios=(1, 1, 1, 1),  # stage-1 map is 4x4 at 16px input
)


def build_resume_checkpoint(path):
    """Encoder resume checkpoint in the reference's on-disk format
    (run.py:1575-1592 save / 1595-1607 load): DataParallel state dict
    under 'model_coord', iteration pinned 3 steps before max_iters, lr
    as saved. 'optimizer_coord' and 'random_state' are deliberately
    absent -> fresh Adam state and fresh sampler state (run.py:1597,
    1604), which the replay mirrors. Returns the raw state dict."""
    sys.path.insert(0, STUBS)
    sys.path.insert(0, REF)
    import torch
    from models import segformer as ref_seg

    class Narrow(ref_seg.Segformer):
        def __init__(self, *a, **kw):
            kw['embed_dims'] = list(CFG['seg_embed_dims'])
            kw['depths'] = list(CFG['seg_depths'])
            kw['num_heads'] = list(CFG['seg_num_heads'])
            kw['sr_ratios'] = list(CFG['seg_sr_ratios'])
            kw['drop_path_rate'] = 0.0
            super().__init__(*a, **kw)

    orig = ref_seg.Segformer
    ref_seg.Segformer = Narrow
    try:
        from models import encoder as ref_enc
        torch.manual_seed(321)
        enc = ref_enc.BootstrapEncoder(CFG['latent_dim'],
                                       pose_regressor=True,
                                       latent_regressor=True,
                                       separate_backbones=False,
                                       pretrained=False)
    finally:
        ref_seg.Segformer = orig
    sd = {'module.' + k: v for k, v in enc.state_dict().items()}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'wb') as f:
        torch.save({'model_coord': sd,
                    'iteration': CFG['start_iteration'],
                    'lr': CFG['lr']}, f)
    return {k: v.detach().numpy() for k, v in enc.state_dict().items()}


def load_final_checkpoint(path):
    """Final trained weights + Adam moments, flattened for npz."""
    import torch
    with open(path, 'rb') as f:
        ckpt = torch.load(f, map_location='cpu', weights_only=False)
    out = {}
    for k, v in ckpt['model_coord'].items():
        out[f'final/{k[len("module."):]}'] = v.detach().numpy()
    opt = ckpt['optimizer_coord']
    for idx, st in opt['state'].items():
        out[f'final_adam/{idx}/exp_avg'] = st['exp_avg'].numpy()
        out[f'final_adam/{idx}/exp_avg_sq'] = st['exp_avg_sq'].numpy()
    out['final_iteration'] = np.asarray(ckpt['iteration'])
    return out


def main():
    work = tempfile.mkdtemp(prefix='enc_golden_')
    data_dir = os.path.join(work, 'data')
    root_dir = os.path.join(work, 'root')
    os.makedirs(data_dir)
    os.makedirs(root_dir)

    rng = np.random.RandomState(717)
    images, poses, focal = make_dataset(
        data_dir, rng, res=CFG['resolution'], n_images=CFG['n_images'],
        focal_px=CFG['focal_px'])

    ckpt_rel = os.path.join('trajinit', 'init.pth')
    g_sd, _ = build_init_checkpoint(
        os.path.join(root_dir, 'gan_checkpoints', ckpt_rel),
        channel_base=CFG['channel_base'], channel_max=CFG['channel_max'],
        latent_dim=CFG['latent_dim'], resolution=CFG['resolution'])
    # run.py:110 strips the '.pth' component from --resume_from; the
    # encoder checkpoint dir is coords_checkpoints/trajinit and the
    # experiment name is 'c_it0' (GAN checkpoint iteration 0,
    # run.py:1532-1535).
    coord_latest = os.path.join(root_dir, 'coords_checkpoints', 'trajinit',
                                'c_it0_latest.pth')
    enc_sd = build_resume_checkpoint(coord_latest)

    tape_path = os.path.join(work, 'tape.json')
    env = dict(os.environ)
    env.update({
        'PYTORCH_JIT': '0',
        'REF_TAPE_OUT': tape_path,
        'REF_CHANNEL_BASE': str(CFG['channel_base']),
        'REF_CHANNEL_MAX': str(CFG['channel_max']),
        'REF_NO_DATASET_OVERRIDES': '1',
        'REF_SEG_NARROW': '|'.join(
            ','.join(str(x) for x in CFG[k])
            for k in ('seg_embed_dims', 'seg_depths', 'seg_num_heads',
                      'seg_sr_ratios')),
        'REF_SEG_DROP_PATH': '0',
        'REF_TAP_SCALARS': '1',
        'REF_PATH': REF,
        'CUDA_VISIBLE_DEVICES': '',
    })
    cmd = [sys.executable, os.path.join(REPO, 'scripts', 'ref_runner.py'),
           '--run_inversion', '--inv_train_coord_only',
           '--dataset', CFG['dataset'],
           '--data_path', data_dir,
           '--root_path', root_dir,
           '--gpus', '1',
           '--batch_size', str(CFG['batch_size']),
           '--resume_from', ckpt_rel,
           '--latent_dim', str(CFG['latent_dim']),
           '--resolution', str(CFG['resolution'])]
    print('Running reference:', ' '.join(cmd))
    subprocess.run(cmd, check=True, env=env, cwd=REPO)

    with open(tape_path) as f:
        tape = json.load(f)
    final = load_final_checkpoint(coord_latest)

    out = {
        'images': images,
        'poses': poses,
        'focal': focal,
        'config_json': np.str_(json.dumps(dict(CFG))),
        'tape_json': np.str_(json.dumps(tape)),
    }
    for k, v in g_sd.items():
        out[f'init_g/{k}'] = v
    for k, v in enc_sd.items():
        out[f'init_enc/{k}'] = v
    out.update(final)

    dest = os.path.join(REPO, 'tests', 'golden', 'trajectory_encoder.npz')
    np.savez_compressed(dest, **out)
    print('Wrote', dest, f'({len(out)} arrays)')
    shutil.rmtree(work)


if __name__ == '__main__':
    main()
