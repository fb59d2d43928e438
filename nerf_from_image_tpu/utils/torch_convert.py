"""Converts reference PyTorch checkpoints to this framework's param trees.

Covers the weight spaces the reference ships or downloads
(SURVEY §7.3.1): the triplane Generator/EMA + Discriminator
(gan_checkpoints/*.pth), the SegFormer MiT-B5 backbone + BootstrapEncoder
heads (coords_checkpoints/*.pth, mit_b5.pth), LPIPS-VGG, and the FID
InceptionV3. Pure numpy transforms on state-dict arrays; torch is only
needed to unpickle .pth files.

Layout conventions:
  torch Linear weight (out, in)      -> EqualizedLinear 'weight' (out, in)
  torch Linear -> flax Dense kernel  -> transpose to (in, out)
  torch Conv (out, in, kh, kw)       -> flax Conv kernel (kh, kw, in, out)
  EqualizedConv2d keeps torch layout (out, in, kh, kw).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, 'detach'):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    with open(path, 'rb') as f:
        obj = torch.load(f, map_location='cpu', weights_only=False)
    if isinstance(obj, dict) and 'state_dict' in obj:
        obj = obj['state_dict']
    return {k: _np(v) for k, v in obj.items()}


def _dense(sd, key):
    return {'kernel': sd[f'{key}.weight'].T, 'bias': sd[f'{key}.bias']}


def _dense_nobias(sd, key):
    return {'kernel': sd[f'{key}.weight'].T}


def _conv(sd, key, bias=True):
    out = {'kernel': sd[f'{key}.weight'].transpose(2, 3, 1, 0)}
    if bias:
        out['bias'] = sd[f'{key}.bias']
    return out


def _eq_linear(sd, key, bias=True):
    out = {'weight': sd[f'{key}.weight']}
    if bias and f'{key}.bias' in sd:
        out['bias'] = sd[f'{key}.bias']
    return out


def _eq_conv(sd, key, bias=True):
    out = {'weight': sd[f'{key}.weight']}
    if bias and f'{key}.bias' in sd:
        out['bias'] = sd[f'{key}.bias']
    return out


def _layernorm(sd, key):
    return {'scale': sd[f'{key}.weight'], 'bias': sd[f'{key}.bias']}


# ---------------------------------------------------------------------------
# Submodule converters (used by convert_generator/… and directly by the
# weight-parity golden tests against the reference modules)
# ---------------------------------------------------------------------------

def convert_mapping(sd: Dict[str, np.ndarray],
                    prefix: str = '') -> Dict[str, Any]:
    """stylegan.MappingNetwork state dict -> flax params."""
    mn: Dict[str, Any] = {}
    idx = 0
    while f'{prefix}fc{idx}.weight' in sd:
        mn[f'fc{idx}'] = _eq_linear(sd, f'{prefix}fc{idx}')
        idx += 1
    if f'{prefix}embed.weight' in sd:
        mn['embed'] = _eq_linear(sd, f'{prefix}embed')
    return mn


def convert_synthesis(sd: Dict[str, np.ndarray],
                      prefix: str = '',
                      buffers_out: Dict[str, Any] = None) -> Dict[str, Any]:
    """stylegan.SynthesisNetwork state dict -> flax params.

    buffers_out: optional dict populated with the per-layer `noise_const`
    buffers (stylegan.py:319-320), mirroring the params tree layout, so
    noise-enabled checkpoints (cub/imagenet_elephant) keep the reference's
    frozen noise for the deterministic 'const' render mode."""
    syn: Dict[str, Any] = {}
    resolutions = sorted({
        int(m.group(1)) for k in sd
        if (m := re.match(re.escape(prefix) + r'b(\d+)\.', k))
    })
    for res in resolutions:
        blk: Dict[str, Any] = {}
        base = f'{prefix}b{res}'
        if f'{base}.const' in sd:
            blk['const'] = sd[f'{base}.const']
        for conv in ('conv0', 'conv1'):
            if f'{base}.{conv}.weight' not in sd:
                continue
            c = {
                'weight': sd[f'{base}.{conv}.weight'],
                'bias': sd[f'{base}.{conv}.bias'],
                'affine': _eq_linear(sd, f'{base}.{conv}.affine'),
            }
            if f'{base}.{conv}.noise_strength' in sd:
                c['noise_strength'] = sd[f'{base}.{conv}.noise_strength']
            if (buffers_out is not None and
                    f'{base}.{conv}.noise_const' in sd):
                buffers_out.setdefault(f'b{res}', {})[conv] = {
                    'noise_const': sd[f'{base}.{conv}.noise_const']}
            blk[conv] = c
        blk['torgb'] = {
            'weight': sd[f'{base}.torgb.weight'],
            'bias': sd[f'{base}.torgb.bias'],
            'affine': _eq_linear(sd, f'{base}.torgb.affine'),
        }
        syn[f'b{res}'] = blk
    return syn


def convert_attention_mapper(sd: Dict[str, np.ndarray],
                             prefix: str = '') -> Dict[str, Any]:
    tm: Dict[str, Any] = {'const': sd[f'{prefix}const']}
    for i in range(1, 5):
        tm[f'fc{i}'] = _eq_linear(sd, f'{prefix}fc{i}', bias=False)
        tm[f'norm{i}'] = {
            'fc_gamma': _eq_linear(sd, f'{prefix}norm{i}.fc_gamma'),
            'fc_beta': _eq_linear(sd, f'{prefix}norm{i}.fc_beta'),
        }
    tm['fc5'] = _eq_linear(sd, f'{prefix}fc5')
    tm['fc_values'] = _eq_linear(sd, f'{prefix}fc_values')
    return tm


def convert_viewdir_mapper(sd: Dict[str, np.ndarray],
                           prefix: str = '') -> Dict[str, Any]:
    vm: Dict[str, Any] = {}
    for i in range(7):
        has_bias = f'{prefix}fc{i}.bias' in sd
        vm[f'fc{i}'] = _eq_linear(sd, f'{prefix}fc{i}', bias=has_bias)
    for i in range(1, 5):
        vm[f'norm{i}'] = _layernorm(sd, f'{prefix}norm{i}')
    vm['output'] = _eq_linear(sd, f'{prefix}output')
    return vm


def convert_seg_block(sd: Dict[str, np.ndarray],
                      prefix: str = '') -> Dict[str, Any]:
    """One reference SegBlock state dict -> flax SegBlock params."""
    attn = {
        'q': _dense(sd, f'{prefix}attn.q'),
        'kv': _dense(sd, f'{prefix}attn.kv'),
        'proj': _dense(sd, f'{prefix}attn.proj'),
    }
    if f'{prefix}attn.sr.weight' in sd:
        attn['sr'] = _conv(sd, f'{prefix}attn.sr')
        attn['norm'] = _layernorm(sd, f'{prefix}attn.norm')
    return {
        'norm1': _layernorm(sd, f'{prefix}norm1'),
        'norm2': _layernorm(sd, f'{prefix}norm2'),
        'attn': attn,
        'mlp': {
            'fc1': _dense(sd, f'{prefix}mlp.fc1'),
            'fc2': _dense(sd, f'{prefix}mlp.fc2'),
            'dwconv': {'dwconv': _conv(sd, f'{prefix}mlp.dwconv.dwconv')},
        },
    }


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def convert_residual_encoder(sd: Dict[str, np.ndarray],
                             prefix: str = 'emb.') -> Dict[str, Any]:
    """Reference ResidualEncoder (generator.py:63-129) -> flax params.

    Instance-norm affine params (G-side, use_instance_norm=True) become
    the flat 'norm{i}_scale'/'norm{i}_bias' params; the mid convs then
    carry no bias (reference `bias = False` when instance-norm)."""
    p: Dict[str, Any] = {}
    has_norm = f'{prefix}norm3.weight' in sd
    for i in range(1, 11):
        bias = (i in (1, 2, 9, 10)) or not has_norm
        p[f'conv{i}'] = _eq_conv(sd, f'{prefix}conv{i}', bias=bias)
    p['shortcut'] = _eq_conv(sd, f'{prefix}shortcut', bias=False)
    if has_norm:
        for i in range(3, 9):
            p[f'norm{i}_scale'] = sd[f'{prefix}norm{i}.weight']
            p[f'norm{i}_bias'] = sd[f'{prefix}norm{i}.bias']
    return p


def convert_generator(sd: Dict[str, np.ndarray],
                      attention_values: int = 10,
                      use_viewdir: bool = False,
                      use_sdf: bool = True,
                      plane_resolution: int = 256) -> Dict[str, Any]:
    """Reference Generator state_dict -> flax {'params': ...} tree."""
    p: Dict[str, Any] = {}

    p['mapping_network'] = convert_mapping(sd, 'mapping_network.backbone.')
    if 'emb.conv1.weight' in sd:  # encoder-mode GAN (use_encoder)
        p['emb'] = convert_residual_encoder(sd, 'emb.')
    syn_buffers: Dict[str, Any] = {}
    p['synthesis_network'] = convert_synthesis(sd, 'synthesis_network.',
                                               buffers_out=syn_buffers)

    # Triplanar decoder (net.0 / net.2).
    p['decoder'] = {
        'fc0': _eq_linear(sd, 'decoder.net.0'),
        'fc1': _eq_linear(sd, 'decoder.net.2'),
    }

    if use_sdf:
        p['beta'] = sd['beta']
        p['alpha'] = sd['alpha']

    if attention_values > 0:
        p['texture_mapper'] = convert_attention_mapper(sd, 'texture_mapper.')

    if use_viewdir:
        p['viewdir_mapper'] = convert_viewdir_mapper(sd, 'viewdir_mapper.')

    out = {'params': p}
    if syn_buffers:
        out['buffers'] = {'synthesis_network': syn_buffers}
    return out


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------

def convert_discriminator(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    if 'emb.conv1.weight' in sd:  # image-conditional D (use_encoder)
        p['emb'] = convert_residual_encoder(sd, 'emb.')
    bb: Dict[str, Any] = {}
    resolutions = sorted({
        int(m.group(1)) for k in sd
        if (m := re.match(r'backbone\.b(\d+)\.', k))
    })
    for res in resolutions:
        base = f'backbone.b{res}'
        blk: Dict[str, Any] = {}
        if res == 4:
            blk['conv'] = _eq_conv(sd, f'{base}.conv')
            blk['fc'] = _eq_linear(sd, f'{base}.fc')
            blk['out'] = _eq_linear(sd, f'{base}.out')
        else:
            if f'{base}.fromrgb.weight' in sd:
                blk['fromrgb'] = _eq_conv(sd, f'{base}.fromrgb')
            blk['conv0'] = _eq_conv(sd, f'{base}.conv0')
            blk['conv1'] = _eq_conv(sd, f'{base}.conv1')
            blk['skip'] = _eq_conv(sd, f'{base}.skip', bias=False)
        bb[f'b{res}'] = blk
    if 'backbone.mapping.fc0.weight' in sd:
        mp = {}
        idx = 0
        while f'backbone.mapping.fc{idx}.weight' in sd:
            mp[f'fc{idx}'] = _eq_linear(sd, f'backbone.mapping.fc{idx}')
            idx += 1
        bb['mapping'] = mp
    p['backbone'] = bb
    return {'params': p}


# ---------------------------------------------------------------------------
# SegFormer / BootstrapEncoder
# ---------------------------------------------------------------------------

def convert_segformer(sd: Dict[str, np.ndarray],
                      prefix: str = '') -> Dict[str, Any]:
    """mit_b5-style state dict -> flax Segformer params."""
    g = lambda k: sd[prefix + k]
    p: Dict[str, Any] = {}
    depths = []
    for i in range(1, 5):
        d = 0
        while f'{prefix}block{i}.{d}.norm1.weight' in sd:
            d += 1
        depths.append(d)
    for i in range(1, 5):
        p[f'patch_embed{i}'] = {
            'proj': _conv(sd, f'{prefix}patch_embed{i}.proj'),
            'norm': _layernorm(sd, f'{prefix}patch_embed{i}.norm'),
        }
        for j in range(depths[i - 1]):
            base = f'{prefix}block{i}.{j}'
            p[f'block{i}_{j}'] = convert_seg_block(sd, f'{base}.')
        p[f'norm{i}'] = _layernorm(sd, f'{prefix}norm{i}')
    # Decode head (present in trained encoders, absent in mit_b5 weights).
    for i in range(1, 5):
        if f'{prefix}linear_c{i}.proj.weight' in sd:
            p[f'linear_c{i}'] = _dense(sd, f'{prefix}linear_c{i}.proj')
    if f'{prefix}linear_fuse.weight' in sd:
        p['linear_fuse'] = _conv(sd, f'{prefix}linear_fuse')
    if f'{prefix}linear_pred.weight' in sd:
        p['linear_pred'] = _conv(sd, f'{prefix}linear_pred')
    return p


def convert_bootstrap_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference BootstrapEncoder state dict (optionally DataParallel
    'module.'-prefixed) -> flax params."""
    if any(k.startswith('module.') for k in sd):
        sd = {k[len('module.'):]: v for k, v in sd.items()}
    p: Dict[str, Any] = {'backbone': convert_segformer(sd, 'backbone.')}
    if 'backbone_latent.patch_embed1.proj.weight' in sd:
        p['backbone_latent'] = convert_segformer(sd, 'backbone_latent.')
    if 'post.0.weight' in sd:
        p['post0'] = _conv(sd, 'post.0')
        p['post1'] = _conv(sd, 'post.2')
        p['post2'] = _conv(sd, 'post.4')
    if 'w_regressor_pre.0.weight' in sd:
        p['w_pre'] = _conv(sd, 'w_regressor_pre.0')
        p['w_post0'] = _dense(sd, 'w_regressor_post.0')
        p['w_post1'] = _dense(sd, 'w_regressor_post.2')
    return {'params': p}


# ---------------------------------------------------------------------------
# Adam optimizer-moment conversion (reference run.py:883-884,1482-1484)
# ---------------------------------------------------------------------------

# state_dict leaves registered with register_buffer in the reference
# models (stylegan.py:199,312,320,393): present in the state_dict but
# absent from model.parameters(), so they carry no optimizer state.
_BUFFER_LEAVES = ('resample_filter', 'noise_const')


def param_names_in_order(sd: Dict[str, np.ndarray]):
    """state_dict keys restricted to learnable parameters, in
    ``model.parameters()`` order.

    torch's state_dict and named_parameters() traverse modules in the
    same DFS registration order (own entries before children), so
    filtering buffer leaves out of the state_dict keys reproduces the
    parameter order that indexes torch optimizer state (the reference
    builds its optimizers over plain .parameters() lists,
    run.py:681-688)."""
    return [k for k in sd if k.rsplit('.', 1)[-1] not in _BUFFER_LEAVES]


def convert_adam_moments(sd, opt_sd: Dict[str, Any], convert_fn,
                         index_offset: int = 0):
    """torch Adam optimizer state -> ``(mu_tree, nu_tree, step, n_params)``.

    Replaces each parameter entry of ``sd`` with its exp_avg /
    exp_avg_sq (identical shapes) and runs the same per-entry weight
    converter, so moments land on exactly the flax leaves their
    parameters map to. This is valid because every converter transform
    is a pure layout permutation (transpose/reshape), under which Adam
    moments transform identically to their parameters. Parameters the
    torch optimizer never stepped (no grads yet) get zero moments.

    ``index_offset`` selects the tail of a concatenated parameter list:
    the reference's optimizer_d covers discriminator.parameters() +
    discriminator2.parameters() back to back (run.py:684-688).
    """
    sd = {k: _np(v) for k, v in sd.items()}
    names = param_names_in_order(sd)
    t_state = opt_sd['state']
    mu_sd = dict(sd)
    nu_sd = dict(sd)
    step = 0
    for i, name in enumerate(names):
        st = t_state.get(index_offset + i,
                         t_state.get(str(index_offset + i)))
        if st is None:
            mu_sd[name] = np.zeros_like(sd[name])
            nu_sd[name] = np.zeros_like(sd[name])
            continue
        mu = _np(st['exp_avg'])
        nu = _np(st['exp_avg_sq'])
        if mu.shape != sd[name].shape:
            raise ValueError(
                f'optimizer state {index_offset + i} shape {mu.shape} does '
                f'not match parameter {name!r} {sd[name].shape}; the '
                'parameter-order reconstruction does not fit this checkpoint')
        mu_sd[name] = mu
        nu_sd[name] = nu
        step = max(step, int(_np(st['step'])))
    return convert_fn(mu_sd), convert_fn(nu_sd), step, len(names)


# ---------------------------------------------------------------------------
# LPIPS (VGG16) and InceptionV3 (FID)
# ---------------------------------------------------------------------------

_VGG_CONV_FEATURE_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG_SLICES = ((0, 1), (2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12))


def convert_lpips(vgg_sd: Dict[str, np.ndarray],
                  lin_sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision vgg16 `features.*` weights + lpips `lin*` weights ->
    flax LPIPS params."""
    p: Dict[str, Any] = {'net': {}}
    for ci, fi in enumerate(_VGG_CONV_FEATURE_IDX):
        key = f'features.{fi}'
        if f'{key}.weight' not in vgg_sd:
            # lpips package stores as net.slice{n}.{fi}.weight.
            slice_idx = next(si for si, convs in enumerate(_VGG_SLICES)
                             if ci in convs)
            key = f'net.slice{slice_idx + 1}.{fi}'
        p['net'][f'conv{ci}'] = _conv(vgg_sd, key)
    for i in range(5):
        w = lin_sd.get(f'lin{i}.model.1.weight',
                       lin_sd.get(f'lins.{i}.model.1.weight'))
        assert w is not None, f'missing lin{i} weights'
        p[f'lin{i}'] = {'kernel': w.transpose(2, 3, 1, 0)}
    return {'params': p}


def convert_inception(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """pytorch-fid FID-Inception state dict -> flax params+batch_stats."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    convs = sorted({k.rsplit('.conv.weight', 1)[0] for k in sd
                    if k.endswith('.conv.weight')})
    for base in convs:
        parts = base.split('.')
        # e.g. 'Mixed_5b.branch1x1' -> params['Mixed_5b']['branch1x1'].
        node_p, node_s = params, stats
        for part in parts[:-1]:
            node_p = node_p.setdefault(part, {})
            node_s = node_s.setdefault(part, {})
        leaf = parts[-1]
        node_p[leaf] = {
            'conv': {'kernel': sd[f'{base}.conv.weight'].transpose(2, 3, 1,
                                                                   0)},
            'bn_scale': sd[f'{base}.bn.weight'],
            'bn_bias': sd[f'{base}.bn.bias'],
        }
        node_s[leaf] = {
            'mean': sd[f'{base}.bn.running_mean'],
            'var': sd[f'{base}.bn.running_var'],
        }
    return {'params': params, 'batch_stats': stats}
