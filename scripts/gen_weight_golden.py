"""Generates weight-conversion parity goldens from the reference models.

For each convertible weight space, builds the reference torch module with
RANDOM weights at a small-but-faithful configuration, records its
state_dict + a fixed input + the reference forward output. Tests
(tests/test_weight_parity.py) then convert the state_dict with
utils/torch_convert.py and assert the flax forward matches <= 1e-4
(SURVEY hard part #1).

Scope notes:
- Full-size G/D state dicts are ~80 MB; goldens instead cover every
  converted submodule family at reduced channel counts (the converter's
  name mapping and the flax modules' math are identical across sizes).
- LPIPS (lpips pkg) and FID-Inception (pytorch-fid) are NOT importable in
  this container, so their goldens cannot be generated here; their
  converters are covered by structural round-trip tests instead.

Usage: python scripts/gen_weight_golden.py [--reference /root/reference]
"""

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reference', default='/root/reference')
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(__file__), '..', 'tests', 'golden'))
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import torch  # noqa: E402
    from models import stylegan  # noqa: E402
    from models import generator as ref_gen  # noqa: E402
    from models import segformer as ref_seg  # noqa: E402

    torch.manual_seed(0)
    out = {}

    def record(tag, module, forward, inputs):
        module.eval()
        with torch.no_grad():
            result = forward(module, *[torch.from_numpy(x) for x in inputs])
        for k, v in module.state_dict().items():
            out[f'{tag}.sd.{k}'] = v.detach().numpy()
        for i, x in enumerate(inputs):
            out[f'{tag}.in{i}'] = x
        if isinstance(result, (tuple, list)):
            for i, r in enumerate(result):
                out[f'{tag}.out{i}'] = r.detach().numpy()
        else:
            out[f'{tag}.out0'] = result.detach().numpy()

    f32 = lambda *shape: np.random.RandomState(
        hash(shape) % 2**31).randn(*shape).astype(np.float32)

    # --- Mapping network (z only, 2 layers, lr_mult 0.01) ----------------
    mn = stylegan.MappingNetwork(z_dim=64, c_dim=0, w_dim=64, num_ws=3,
                                 num_layers=2, lr_multiplier=0.01,
                                 normalize_c=False)
    record('mapping', mn, lambda m, z: m(z, None), [f32(4, 64)])

    # --- Conditional mapping (c_dim > 0, normalize_c=False) --------------
    mnc = stylegan.MappingNetwork(z_dim=64, c_dim=32, w_dim=64, num_ws=None,
                                  num_layers=2, lr_multiplier=0.01,
                                  normalize_c=False)
    record('mapping_cond', mnc, lambda m, z, c: m(z, c),
           [f32(4, 64), f32(4, 32)])

    # --- Full synthesis network at tiny channels -------------------------
    syn = stylegan.SynthesisNetwork(w_dim=64, img_resolution=32,
                                    img_channels=24, channel_base=1024,
                                    channel_max=128)
    n_ws = syn.num_ws
    record('synthesis', syn,
           lambda m, ws: m(ws, noise_mode='random'),
           [f32(2, n_ws, 64)])

    # --- Triplanar decoder ------------------------------------------------
    dec = ref_gen.TriplanarDecoder(32, 10)
    record('decoder', dec, lambda m, x: m.net(x), [f32(2, 5, 32)])

    # --- Attention mapper -------------------------------------------------
    am = ref_gen.AttentionMapper(64, 6)
    record('attention_mapper', am, lambda m, c: m(c), [f32(3, 64)])

    # --- View-direction mapper -------------------------------------------
    vm = ref_gen.ViewDirectionMapper(6, num_features=16)
    record('viewdir_mapper', vm,
           lambda m, vd, feats: m(vd)(feats),
           [f32(2, 7, 1, 3), f32(2, 7, 4, 16)])

    # --- Discriminator backbone at tiny channels -------------------------
    db = stylegan.DiscriminatorBackbone(
        c_dim=13, img_resolution=32, img_channels=3, channel_base=1024,
        channel_max=128,
        mapping_kwargs=dict(lr_multiplier=0.01, num_layers=2,
                            normalize_c=False))
    record('disc_backbone', db, lambda m, img, c: m(img, c),
           [f32(4, 3, 32, 32), f32(4, 13)])

    # --- SegFormer pieces -------------------------------------------------
    pe = ref_seg.SegOverlapPatchEmbed(img_size=32, patch_size=7, stride=4,
                                      in_channels=3, embed_dim=32)
    record('seg_patch_embed', pe, lambda m, x: list(m(x))[0:1],
           [f32(2, 3, 32, 32)])

    blk = ref_seg.SegBlock(dim=32, num_heads=2, mlp_ratio=4, sr_ratio=2)
    record('seg_block', blk,
           lambda m, x: m(x, 8, 8), [f32(2, 64, 32)])

    blk1 = ref_seg.SegBlock(dim=32, num_heads=2, mlp_ratio=4, sr_ratio=1)
    record('seg_block_sr1', blk1,
           lambda m, x: m(x, 8, 8), [f32(2, 64, 32)])

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, 'weight_golden.npz')
    np.savez_compressed(path, **out)
    size = os.path.getsize(path) / 1e6
    print(f'wrote {path} ({size:.1f} MB, {len(out)} arrays)')


if __name__ == '__main__':
    main()
