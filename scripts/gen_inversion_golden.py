"""Generates the inversion-trajectory parity golden (VERDICT r3 next #1).

Runs the REAL /root/reference/run.py hybrid inversion
(run.py:1743-2400) for 5 Adam refinement steps on a synthetic
CARLA-format fixture with a narrow-channel GAN (EMA weights from a known
init checkpoint) and a narrow-backbone BootstrapEncoder checkpoint,
capturing:
- every RNG draw (substituted seeded values; scripts/ref_runner.py),
- the bootstrap-encoder outputs and the cv2 PnP pose estimate
  (value taps in ref_runner, REF_TAP_VALUES=1),
- the per-step tensorboard scalars monitor_b0/{psnr,lpips,rot_error}
  (run.py:2288-2296),
- the final report.pth (ws/z0/R/s/t2 + psnr/ssim/lpips arrays at
  checkpoint steps 0 and 5, run.py:2338-2401).

The LPIPS net is the seeded-random stub (scripts/ref_stubs/lpips,
torch.Generator(7771)) — the rebuild test reconstructs the identical
weights in-process and converts them to the flax LPIPS, so both the
vgg loss and the lpips monitor are exact-weight comparisons.

tests/test_inversion_trajectory.py replays the identical trajectory
through the rebuild's invert/optimizer.py refinement loop.

Usage:
  python scripts/gen_inversion_golden.py        # l1 tape
  python scripts/gen_inversion_golden.py vgg    # vgg (15-crop) tape
Writes tests/golden/trajectory_inversion_{l1,vgg}.npz.
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
                                   make_dataset, read_tb_scalars)

# Inversion trajectory config (mirrored exactly by the rebuild test).
CFG = dict(
    dataset='carla',
    n_images=2,
    resolution=16,
    batch_size=4,  # run.py:1758 -> test_bs = 4 // 4 * 1 = 1
    latent_dim=512,  # w-space dim is fixed at 512; the encoder w head
    # and z_ live in w-space (run.py:1960-1978), so latent_dim must match
    channel_base=GAN_CFG['channel_base'],
    channel_max=GAN_CFG['channel_max'],
    scene_range=3.0,
    white_background=True,
    focal_px=19.2,
    inv_steps=5,
    inv_gain_z=5,
    # Narrow SegFormer backbone (reference constructor kwargs).
    seg_embed_dims=(8, 16, 32, 32),
    seg_depths=(1, 1, 2, 1),
    seg_num_heads=(1, 2, 4, 4),
    seg_sr_ratios=(1, 1, 1, 1),  # stage-1 map is 4x4 at 16px input
)


def build_coord_checkpoint(path):
    """BootstrapEncoder checkpoint in the reference's on-disk format
    (run.py:1796-1801: DataParallel state dict under 'model_coord'),
    with the same narrow-backbone surgery ref_runner applies."""
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
            super().__init__(*a, **kw)

    orig = ref_seg.Segformer
    ref_seg.Segformer = Narrow
    try:
        from models import encoder as ref_enc
        torch.manual_seed(123)
        enc = ref_enc.BootstrapEncoder(CFG['latent_dim'],
                                       pose_regressor=True,
                                       latent_regressor=True,
                                       separate_backbones=False,
                                       pretrained=False)
    finally:
        ref_seg.Segformer = orig
    # Shape the random heads into usable outputs: spread the coords
    # (PnP needs non-degenerate 3D points) and bias the mask head so
    # sigmoid(mask) clears the 0.9 PnP threshold (run.py:1710).
    with torch.no_grad():
        enc.post[4].weight[:3] *= 20.0
        enc.post[4].bias[3] = 3.0
    sd = {'module.' + k: v for k, v in enc.state_dict().items()}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'wb') as f:
        torch.save({'model_coord': sd}, f)


def load_report(path):
    """Flattens the consolidated report.pth (run.py:2338-2401) into
    {step/key: np.ndarray} for npz storage."""
    import torch
    with open(path, 'rb') as f:
        report = torch.load(f, weights_only=False)
    out = {}
    for step, entry in report.items():
        for k, v in entry.items():
            out[f'{step}/{k}'] = (v.numpy() if torch.is_tensor(v)
                                  else np.asarray(v))
    return out


def main():
    loss = sys.argv[1] if len(sys.argv) > 1 else 'l1'
    assert loss in ('l1', 'vgg', 'mse', 'vgg_nocrop', 'mixed')

    work = tempfile.mkdtemp(prefix='inv_golden_')
    data_dir = os.path.join(work, 'data')
    root_dir = os.path.join(work, 'root')
    os.makedirs(data_dir)
    os.makedirs(root_dir)

    rng = np.random.RandomState(616)
    images, poses, focal = make_dataset(
        data_dir, rng, res=CFG['resolution'], n_images=CFG['n_images'],
        focal_px=CFG['focal_px'])

    ckpt_rel = os.path.join('trajinit', 'init.pth')
    g_sd, _ = build_init_checkpoint(
        os.path.join(root_dir, 'gan_checkpoints', ckpt_rel),
        channel_base=CFG['channel_base'], channel_max=CFG['channel_max'],
        latent_dim=CFG['latent_dim'], resolution=CFG['resolution'])
    build_coord_checkpoint(
        os.path.join(root_dir, 'coords_checkpoints', 'trajinit',
                     'coordinit.pth'))

    # eval_indices_perm: torch.randperm with a fresh seed-1234 generator
    # (run.py:417-477; carla consumes no generator draws before it).
    import torch
    gen = torch.Generator().manual_seed(1234)
    perm = torch.randperm(CFG['n_images'], generator=gen).numpy()

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
        'REF_TAP_VALUES': '1',
        'REF_PATH': REF,
        'CUDA_VISIBLE_DEVICES': '',
    })
    cmd = [sys.executable, os.path.join(REPO, 'scripts', 'ref_runner.py'),
           '--run_inversion',
           '--dataset', CFG['dataset'],
           '--data_path', data_dir,
           '--root_path', root_dir,
           '--gpus', '1',  # no CUDA here -> CPU; test_bs = batch//4
           '--batch_size', str(CFG['batch_size']),
           '--resume_from', ckpt_rel,
           '--coord_resume_from', 'coordinit',
           '--latent_dim', str(CFG['latent_dim']),
           '--resolution', str(CFG['resolution']),
           '--inv_steps', str(CFG['inv_steps']),
           '--inv_loss', loss,
           '--inv_gain_z', str(CFG['inv_gain_z'])]
    print('Running reference:', ' '.join(cmd))
    subprocess.run(cmd, check=True, env=env, cwd=REPO)

    # The report dir is reports/<resume_from-dir>/<cfg_string>.
    rep_root = os.path.join(root_dir, 'reports', 'trajinit')
    (cfg_string,) = os.listdir(rep_root)
    print('cfg_string:', cfg_string)
    scalars = read_tb_scalars(rep_root)
    report = load_report(os.path.join(rep_root, cfg_string, 'report.pth'))

    with open(tape_path) as f:
        tape = json.load(f)

    cfg_out = dict(CFG)
    cfg_out['loss'] = loss
    out = {
        'images': images,
        'poses': poses,
        'focal': focal,
        'perm': perm,
        'config_json': np.str_(json.dumps(cfg_out)),
        'tape_json': np.str_(json.dumps(tape)),
        'scalars_json': np.str_(json.dumps(scalars)),
    }
    for k, v in report.items():
        out[f'report/{k}'] = v
    for k, v in g_sd.items():
        out[f'init_g/{k}'] = v

    dest = os.path.join(REPO, 'tests', 'golden',
                        f'trajectory_inversion_{loss}.npz')
    np.savez_compressed(dest, **out)
    print('Wrote', dest, f'({len(out)} arrays)')
    shutil.rmtree(work)


if __name__ == '__main__':
    main()
