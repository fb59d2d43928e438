"""Converts reference PyTorch checkpoints into this framework's weights.

Drives utils/torch_convert.py over the reference's checkpoint families
(SURVEY §7.3.1) and writes flattened .npz param trees under
{root_path}/weights/ (the locations cli/run.py and cli/inversion.py load
from):

  gan checkpoint (.pth with model/model_ema/discriminator):
      g.npz, g_ema.npz, d.npz [, d2.npz]
  encoder checkpoint (.pth BootstrapEncoder state dict):  encoder.npz
  mit_b5.pth (SegFormer backbone pretrain):               mit_b5.npz
  torchvision vgg16 + lpips lin weights:                  lpips.npz
  pytorch-fid inception (TF weights):                     inception.npz

Usage:
  python scripts/convert_weights.py --kind gan --src checkpoint_latest.pth \
      --out runs/weights
  python scripts/convert_weights.py --kind inception --src pt_inception.pth
  python scripts/convert_weights.py --kind lpips --src vgg16.pth \
      --src2 lpips_lins.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_from_image_tpu.utils import torch_convert as tc
from nerf_from_image_tpu.utils.weights import save_npz_variables as save


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--kind', required=True,
                    choices=['gan', 'encoder', 'mit_b5', 'lpips',
                             'inception'])
    ap.add_argument('--src', required=True, help='source .pth path')
    ap.add_argument('--src2', help='second source (lpips lin weights)')
    ap.add_argument('--out', default='weights', help='output directory')
    ap.add_argument('--attention_values', type=int, default=10)
    ap.add_argument('--use_viewdir', action='store_true')
    ap.add_argument('--no_sdf', action='store_true')
    args = ap.parse_args()

    if args.kind == 'gan':
        import torch
        with open(args.src, 'rb') as f:
            ckpt = torch.load(f, map_location='cpu', weights_only=False)
        conv = lambda sd: tc.convert_generator(
            {k: tc._np(v) for k, v in sd.items()},
            attention_values=args.attention_values,
            use_viewdir=args.use_viewdir, use_sdf=not args.no_sdf)
        if 'model' in ckpt and ckpt['model'] is not None:
            save(conv(ckpt['model']), os.path.join(args.out, 'g.npz'))
        save(conv(ckpt['model_ema']), os.path.join(args.out, 'g_ema.npz'))
        if ckpt.get('discriminator') is not None:
            save(tc.convert_discriminator(
                {k: tc._np(v) for k, v in ckpt['discriminator'].items()}),
                os.path.join(args.out, 'd.npz'))
        if ckpt.get('discriminator2') is not None:
            save(tc.convert_discriminator(
                {k: tc._np(v) for k, v in ckpt['discriminator2'].items()}),
                os.path.join(args.out, 'd2.npz'))
    elif args.kind == 'encoder':
        sd = tc.load_torch_state_dict(args.src)
        if 'model_coord' in sd or any(k.startswith('model_coord')
                                      for k in sd):
            pass  # raw state dicts handled below
        save(tc.convert_bootstrap_encoder(sd),
             os.path.join(args.out, 'encoder.npz'))
    elif args.kind == 'mit_b5':
        sd = tc.load_torch_state_dict(args.src)
        save({'params': tc.convert_segformer(sd)},
             os.path.join(args.out, 'mit_b5.npz'))
    elif args.kind == 'lpips':
        vgg = tc.load_torch_state_dict(args.src)
        lins = tc.load_torch_state_dict(args.src2) if args.src2 else vgg
        save(tc.convert_lpips(vgg, lins),
             os.path.join(args.out, 'lpips.npz'))
    elif args.kind == 'inception':
        sd = tc.load_torch_state_dict(args.src)
        save(tc.convert_inception(sd),
             os.path.join(args.out, 'inception.npz'))


if __name__ == '__main__':
    main()
