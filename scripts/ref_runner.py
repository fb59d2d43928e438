"""Instrumented driver: executes the REAL /root/reference/run.py with
recorded/substituted randomness, for trajectory-parity goldens.

What it does before handing control to run.py (via runpy):
- Puts scripts/ref_stubs on sys.path so the reference's missing deps
  (lpips, pytorch_fid, skimage, pycocotools, torchvision) resolve to
  interface-compatible shims. The reference's own code is untouched.
- Requires PYTORCH_JIT=0 in the environment so @torch.jit.script leaves
  plain Python functions (TorchScript would bind torch.rand to the ATen
  op at script time, making the draws uninterceptable). The math is
  identical in eager mode.
- Replaces torch.rand/rand_like/randn/randn_like with deterministic
  numpy-seeded draws, logging (site, kind, shape, seed) to a tape. The
  rebuild regenerates the exact same values from the same seeds
  (np.RandomState(seed).random_sample / standard_normal), so no bulk
  noise ships in the golden file.
- Wraps np.random.RandomState so randint/permutation outputs (batch
  indices, EndlessSampler shuffles) are recorded verbatim.
- Optionally narrows StyleGAN channel widths (REF_CHANNEL_BASE /
  REF_CHANNEL_MAX) — SynthesisNetwork/DiscriminatorBackbone expose these
  as constructor kwargs (reference stylegan.py:441-446, 612-617); the
  surgery changes widths only, never math.
- No-ops loaders.override_default_args when REF_NO_DATASET_OVERRIDES=1
  so the CLI flags fully define the config.
- Forces DataLoader num_workers=0 (single-core container).

Writes the tape to $REF_TAPE_OUT as JSON. Invoked as a subprocess by
scripts/gen_trajectory_golden.py; argv after the script name is passed
to run.py verbatim.
"""

import json
import os
import sys

assert os.environ.get('PYTORCH_JIT') == '0', \
    'run with PYTORCH_JIT=0 (TorchScript must be disabled for RNG capture)'

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
REF_PATH = os.environ.get('REF_PATH', '/root/reference')
sys.path.insert(0, os.path.join(_THIS_DIR, 'ref_stubs'))
sys.path.insert(0, REF_PATH)

import numpy as np  # noqa: E402
import torch  # noqa: E402

TAPE = []
_SEED_BASE = 100000
_counter = [0]


def _caller_site():
    f = sys._getframe(2)
    while f is not None:
        fn = f.f_code.co_filename
        if 'ref_runner' not in fn:
            return f'{os.path.basename(fn)}:{f.f_code.co_name}'
        f = f.f_back
    return '?'


def _shape_from_args(args):
    if len(args) == 1 and isinstance(args[0], (tuple, list, torch.Size)):
        return tuple(int(x) for x in args[0])
    return tuple(int(x) for x in args)


def _draw(kind, shape, dtype=None, device=None):
    seed = _SEED_BASE + _counter[0]
    _counter[0] += 1
    r = np.random.RandomState(seed)
    vals = r.random_sample(shape) if kind == 'rand' \
        else r.standard_normal(shape)
    TAPE.append({'site': _caller_site(), 'kind': kind,
                 'shape': list(shape), 'seed': seed})
    t = torch.from_numpy(vals).to(dtype if dtype is not None
                                  else torch.float32)
    if device is not None:
        t = t.to(device)
    return t


def _patch_torch_rng():
    def rand(*args, **kw):
        return _draw('rand', _shape_from_args(args), kw.get('dtype'),
                     kw.get('device'))

    def randn(*args, **kw):
        return _draw('randn', _shape_from_args(args), kw.get('dtype'),
                     kw.get('device'))

    def rand_like(t, **kw):
        return _draw('rand', tuple(t.shape), kw.get('dtype', t.dtype),
                     kw.get('device', t.device))

    def randn_like(t, **kw):
        return _draw('randn', tuple(t.shape), kw.get('dtype', t.dtype),
                     kw.get('device', t.device))

    torch.rand = rand
    torch.randn = randn
    torch.rand_like = rand_like
    torch.randn_like = randn_like


def _patch_randperm_records():
    """Generator-seeded torch.randperm draws (the eval-index/view-perm
    protocol, run.py:416-476, uses a torch.Generator(1234) the rand/randn
    substitution cannot see) are RECORDED verbatim — values unchanged —
    so the replay can consume the exact indices."""
    orig = torch.randperm

    def randperm(*a, **kw):
        out = orig(*a, **kw)
        if kw.get('generator') is not None:
            TAPE.append({'site': _caller_site(), 'kind': 'permutation',
                         'values': out.reshape(-1).tolist()})
        return out

    torch.randperm = randperm


def _patch_print_taps():
    """REF_TAP_PRINTS=1 records print() calls carrying float payloads —
    pretrain_sdf's dist/eik console telemetry (run.py:856-862) is the
    only scalar channel that loop has (no SummaryWriter)."""
    if os.environ.get('REF_TAP_PRINTS') != '1':
        return
    import builtins
    orig = builtins.print

    def prt(*args, **kw):
        vals = [float(a) for a in args if isinstance(a, float)]
        if vals:
            TAPE.append({'site': 'tap:print', 'kind': 'print',
                         'label': str(args[0]), 'values': vals})
        return orig(*args, **kw)

    builtins.print = prt


def _patch_force_init():
    """REF_FORCE_INIT=<path.pth>: loads known state dicts into every
    freshly constructed Generator/Discriminator. Fresh-run-only paths
    (pretrain_sdf runs only when resume_from is None, run.py:821) cannot
    be pinned via --resume_from, and module init uses tensor methods
    (uniform_/normal_) the RNG substitution cannot see — so the tape
    pins the weights by construction instead."""
    path = os.environ.get('REF_FORCE_INIT')
    if not path:
        return
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    from models import generator as ref_gen
    from models import discriminator as ref_disc

    def forced(cls, key):
        class Forced(cls):
            def __init__(self, *a, **kw):
                super().__init__(*a, **kw)
                self.load_state_dict(ckpt[key])
        return Forced

    ref_gen.Generator = forced(ref_gen.Generator, 'model')
    ref_disc.Discriminator = forced(ref_disc.Discriminator,
                                    'discriminator')


def _patch_numpy_rng():
    class RecordingRandomState(np.random.RandomState):
        def randint(self, *a, **kw):
            out = super().randint(*a, **kw)
            TAPE.append({'site': _caller_site(), 'kind': 'randint',
                         'values': np.asarray(out).reshape(-1).tolist()})
            return out

        def permutation(self, *a, **kw):
            out = super().permutation(*a, **kw)
            TAPE.append({'site': _caller_site(), 'kind': 'permutation',
                         'values': np.asarray(out).reshape(-1).tolist()})
            return out

    np.random.RandomState = RecordingRandomState


def _patch_cuda_shims():
    """The inversion path needs --gpus >= 1 for a nonzero batch size
    (run.py:1758), which routes through CUDA-only RNG seeding
    (run.py:704-708) even though the device resolves to CPU when CUDA
    is unavailable (run.py:54-57). No-op those calls here."""
    if torch.cuda.is_available():
        return
    import contextlib
    torch.cuda.device = lambda idx: contextlib.nullcontext()
    torch.cuda.manual_seed = lambda seed: None
    torch.cuda.empty_cache = lambda: None
    # save_random_state (utils.py, called by the coord-regressor
    # save_checkpoint, run.py:1589) snapshots per-gpu RNG states.
    torch.cuda.get_rng_state = lambda *a, **kw: torch.empty(
        0, dtype=torch.uint8)
    torch.cuda.set_rng_state = lambda *a, **kw: None


def _patch_missing_encoder_import():
    """models/discriminator.py:38 references `ResidualEncoder` without
    importing it (an upstream bug: the class lives in models/generator.py
    and the 512-D c_dim accounting at discriminator.py:50-52 matches its
    output width) — any `--use_encoder` run of the public reference dies
    with a NameError. Inject the obviously-intended name so the
    encoder-mode paths are runnable for taping."""
    from models import generator as ref_gen
    from models import discriminator as ref_disc
    if not hasattr(ref_disc, 'ResidualEncoder'):
        ref_disc.ResidualEncoder = ref_gen.ResidualEncoder


def _patch_numpy2_compat():
    """lib/pose_utils.py:74 does np.array(tensor, copy=False), which
    numpy>=2 rejects for torch tensors. Pre-convert the operand; the
    quaternion math is untouched."""
    from lib import pose_utils as ref_pu
    orig = ref_pu.matrix_to_quaternion

    def m2q(matrix):
        return orig(np.asarray(matrix, dtype=np.float64))

    ref_pu.matrix_to_quaternion = m2q


def _patch_dataloader():
    orig = torch.utils.data.DataLoader

    def make(*a, **kw):
        kw['num_workers'] = 0
        return orig(*a, **kw)

    torch.utils.data.DataLoader = make


def _patch_channels():
    cb = os.environ.get('REF_CHANNEL_BASE')
    cm = os.environ.get('REF_CHANNEL_MAX')
    if cb is None and cm is None:
        return
    from models import stylegan as ref_sg

    def narrowed(cls):
        class Narrow(cls):
            def __init__(self, *a, **kw):
                if cb is not None:
                    kw.setdefault('channel_base', int(cb))
                if cm is not None:
                    kw.setdefault('channel_max', int(cm))
                super().__init__(*a, **kw)
        return Narrow

    ref_sg.SynthesisNetwork = narrowed(ref_sg.SynthesisNetwork)
    ref_sg.DiscriminatorBackbone = narrowed(ref_sg.DiscriminatorBackbone)


def _patch_dataset_overrides():
    if os.environ.get('REF_NO_DATASET_OVERRIDES') != '1':
        return
    from data import loaders as ref_loaders
    ref_loaders.override_default_args = lambda args: None


def _patch_segformer_narrow():
    """REF_SEG_NARROW='e0,e1,e2,e3|d0,d1,d2,d3|h0,h1,h2,h3' narrows the
    SegFormer backbone (reference models/segformer.py:176-190 exposes
    these as constructor kwargs that init_segformer doesn't forward).
    Width-only surgery; the encoder's math is untouched."""
    spec = os.environ.get('REF_SEG_NARROW')
    if not spec:
        return
    from models import segformer as ref_seg
    embed, depths, heads, srs = [tuple(int(x) for x in part.split(','))
                                 for part in spec.split('|')]
    # REF_SEG_DROP_PATH overrides drop_path_rate (the encoder-training
    # tape sets it to 0: SegDropPath draws via Tensor.bernoulli_, which
    # bypasses the torch.rand taps; the drop-path MECHANISM is parity-
    # tested at module level, the tape covers everything else).
    dp = os.environ.get('REF_SEG_DROP_PATH')

    class Narrow(ref_seg.Segformer):
        def __init__(self, *a, **kw):
            kw['embed_dims'] = list(embed)
            kw['depths'] = list(depths)
            kw['num_heads'] = list(heads)
            kw['sr_ratios'] = list(srs)
            if dp is not None:
                kw['drop_path_rate'] = float(dp)
            super().__init__(*a, **kw)

    ref_seg.Segformer = Narrow


def _tensor_entry(site, **arrays):
    return {'site': site, 'kind': 'tensors',
            'arrays': {k: {'shape': list(np.asarray(v).shape),
                           'values': np.asarray(v, np.float64)
                           .reshape(-1).tolist()}
                       for k, v in arrays.items() if v is not None}}


def _patch_value_taps():
    """REF_TAP_VALUES=1 records the inversion pipeline's non-RNG
    intermediates needed by the rebuild replay: the bootstrap-encoder
    outputs (run.py:1963-1971) and the PnP pose estimate
    (lib/pose_estimation.py:30-131). Pure observation; values are
    returned unchanged."""
    if os.environ.get('REF_TAP_VALUES') != '1':
        return
    from models import encoder as ref_enc
    orig_fwd = ref_enc.BootstrapEncoder.forward

    def fwd(self, x):
        out = orig_fwd(self, x)
        coords, mask, w = out
        TAPE.append(_tensor_entry(
            'tap:coord_regressor',
            coords=None if coords is None else coords.detach().cpu(),
            mask=None if mask is None else mask.detach().cpu(),
            w=None if w is None else w.detach().cpu()))
        return out

    ref_enc.BootstrapEncoder.forward = fwd

    from lib import pose_estimation as ref_pe
    orig_pnp = ref_pe.compute_pose_pnp

    def pnp(coords, masks, focal_proposals, refine=True):
        out = orig_pnp(coords, masks, focal_proposals, refine)
        w2c, focal, err = out
        TAPE.append(_tensor_entry(
            'tap:pnp', world2cam=w2c, focal=focal, errors=err,
            focal_proposals=np.asarray(focal_proposals, np.float64)))
        return out

    ref_pe.compute_pose_pnp = pnp


def _patch_augment_taps():
    """REF_TAP_AUGMENT=1 records every F.grid_sample output (the
    augmented images of run.py:augment_impl:757-765) — elementwise
    parity evidence for the rebuild's warp. Pure observation."""
    if os.environ.get('REF_TAP_AUGMENT') != '1':
        return
    import torch.nn.functional as F

    orig = F.grid_sample

    def gs(img, grid, **kw):
        out = orig(img, grid, **kw)
        # Only the small augment warps (run.py:757-765) — the renderer's
        # plane-sampling grid_sample outputs are huge and irrelevant.
        if out.numel() <= 65536:
            TAPE.append(_tensor_entry('tap:grid_sample',
                                      output=out.detach().cpu()))
        return out

    F.grid_sample = gs


def _patch_scalar_taps():
    """REF_TAP_SCALARS=1 records every SummaryWriter.add_scalar call on
    the tape. Robust against run.py exiting via sys.exit before the
    writer flushes its event file (run.py:1806-1807,
    --inv_train_coord_only), where read_tb_scalars would see nothing."""
    if os.environ.get('REF_TAP_SCALARS') != '1':
        return
    from torch.utils import tensorboard as tb

    orig = tb.SummaryWriter.add_scalar

    def add_scalar(self, tag, value, step=None, *a, **kw):
        TAPE.append({'site': 'tap:add_scalar', 'kind': 'scalar',
                     'tag': str(tag), 'step': int(step),
                     'value': float(value)})
        return orig(self, tag, value, step, *a, **kw)

    tb.SummaryWriter.add_scalar = add_scalar


def _patch_split_taps():
    """REF_TAP_SPLITS=1 records the loaded train split's image tensors.
    With augment_p > 0 the reference loads every dataset at 2x
    resolution and anti-alias-pools the lowres buffer
    (loaders.py:479-481, 291-308) — the replay must use these EXACT
    tensors, not the fixture's own lowres render."""
    if os.environ.get('REF_TAP_SPLITS') != '1':
        return
    from data import loaders as ref_loaders
    orig = ref_loaders.load_dataset

    def load(args, device, manual_image=None):
        out = orig(args, device, manual_image)
        train_split = out[1]
        hi = getattr(train_split, 'images_highres', None)
        TAPE.append(_tensor_entry(
            'tap:train_split',
            images=train_split.images.cpu(),
            images_highres=None if hi is None else hi.cpu()))
        # The eval split feeds the frozen FID stats + recon targets
        # (run.py:403, 1219-1286); record it too when it differs.
        train_eval_split = out[2]
        if train_eval_split is not train_split:
            TAPE.append(_tensor_entry(
                'tap:train_eval_split',
                images=train_eval_split.images.cpu()))
        return out

    ref_loaders.load_dataset = load


def main():
    _patch_cuda_shims()
    _patch_missing_encoder_import()
    _patch_numpy2_compat()
    _patch_dataloader()
    _patch_channels()
    _patch_dataset_overrides()
    _patch_segformer_narrow()
    _patch_value_taps()
    _patch_scalar_taps()
    _patch_augment_taps()
    _patch_split_taps()
    _patch_print_taps()
    _patch_force_init()
    _patch_numpy_rng()
    _patch_torch_rng()
    _patch_randperm_records()

    sys.argv = ['run.py'] + sys.argv[1:]
    import runpy
    try:
        runpy.run_path(os.path.join(REF_PATH, 'run.py'),
                       run_name='__main__')
    finally:
        out = os.environ.get('REF_TAPE_OUT')
        if out:
            with open(out, 'w') as f:
                json.dump(TAPE, f)
            print(f'[ref_runner] wrote {len(TAPE)} tape entries to {out}')


if __name__ == '__main__':
    main()
