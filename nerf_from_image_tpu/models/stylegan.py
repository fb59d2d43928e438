"""StyleGAN2 backbone in flax (equalized layers, modulated conv, resampling).

TPU-first re-design of the reference backbone
(/root/reference/models/stylegan.py): the modulated convolution keeps the
reference's "scale input / demodulate output" factorization (one shared-
weight batched conv -> pure MXU work, no per-sample grouped conv), bilinear
resampling is expressed as strided/dilated XLA convs whose autodiff equals
the reference's hand-written EfficientResample gradient (the 1-3-3-1 filter
is symmetric), and all activations can run in bfloat16 with fp32 parameters.

Weight-space compatible with the reference checkpoints (see
utils/torch_convert.py for the name mapping).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_from_image_tpu.ops import resample as resample_ops

Dtype = Any


def bilinear_filter() -> jnp.ndarray:
    h = jnp.asarray([1.0, 3.0, 3.0, 1.0])
    h = h[:, None] * h[None, :]
    return h / jnp.sum(h)



def _prec(x):
    """fp32 inputs use exact (HIGHEST) precision; bf16 keeps the fast
    default — the XLA default otherwise downgrades fp32 convs to bf16."""
    return jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None

def _conv2d(x, w, stride=1, padding=0):
    """torch.F.conv2d semantics; x (B,C,H,W), w (O,I,kh,kw)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ('NCHW', 'OIHW', 'NCHW'))
    # No preferred_element_type here: with bf16 operands the conv VJP in
    # this jax version rejects the f32 cotangent ("requires arguments to
    # have the same dtypes"); XLA accumulates bf16 convs in f32 on the
    # MXU regardless, so numerics are unchanged.
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=dn,
        precision=_prec(x))


def _conv_transpose2d(x, w, stride=1, padding=0):
    """torch.F.conv_transpose2d semantics; w (I,O,kh,kw)."""
    # Equivalent: dilate input by `stride`, conv with spatially flipped
    # kernel (I/O swapped), padding k-1-p.
    k = w.shape[-1]
    w_t = jnp.flip(w, axis=(-2, -1)).transpose(1, 0, 2, 3)  # (O,I,kh,kw)
    dn = jax.lax.conv_dimension_numbers(x.shape, w_t.shape,
                                        ('NCHW', 'OIHW', 'NCHW'))
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x, w_t.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=dn,
        precision=_prec(x))


def filter2d(im, kernel=None, gain=1.0, transpose=False):
    """Bilinear 4x4 filter (stride 1) as separable shift-adds; `kernel` is
    accepted for API parity but the filter is always the 1-3-3-1 bilinear
    (stylegan.py:51-69). See ops/resample.py for the TPU rationale."""
    return resample_ops.filter2d(im, gain=gain, transpose=transpose)


def upsample2d(im, kernel=None):
    return resample_ops.upsample2d(im)


def downsample2d(im, kernel=None):
    return resample_ops.downsample2d(im)


def conv_resampled2d(x, w, f=None, up=False, down=False, padding=0):
    """Conv with optional 2x bilinear up/down resampling (stylegan.py:86-111)."""
    assert not (up and down)
    kw = w.shape[-1]

    if kw == 1 and down:
        assert padding == 0
        x = downsample2d(x, f)
        return _conv2d(x, w)
    if down:
        x = filter2d(x, f, transpose=True)
        return _conv2d(x, w, stride=2)
    if up:
        assert padding == 1
        x = _conv_transpose2d(x, w.transpose(1, 0, 2, 3), stride=2)
        return filter2d(x, f, gain=4.0)
    return _conv2d(x, w, padding=padding)


def conv_modulated2d(x,
                     weight,
                     styles,
                     noise=None,
                     up=False,
                     down=False,
                     padding=0,
                     resample_filter=None,
                     demodulate=True):
    """Style-modulated conv (stylegan.py:114-145).

    Input scaling + shared-weight conv + output demodulation — a single
    batched conv on the MXU instead of per-sample grouped convs.
    """
    bs = x.shape[0]
    dcoefs = None
    if demodulate:
        w = weight[None] * styles.reshape(bs, 1, -1, 1, 1).astype(weight.dtype)
        dcoefs = jax.lax.rsqrt(
            jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)  # (B, out)

    x = x * styles.reshape(bs, -1, 1, 1).astype(x.dtype)
    x = conv_resampled2d(x, weight, f=resample_filter, up=up, down=down,
                         padding=padding)
    if demodulate:
        x = x * dcoefs.reshape(bs, -1, 1, 1).astype(x.dtype)
    if noise is not None:
        x = x + noise.astype(x.dtype)
    return x


class EqualizedLinear(nn.Module):
    """Linear layer with runtime weight scaling (stylegan.py:148-180)."""
    out_channels: int
    use_bias: bool = True
    activate: bool = False
    lr_multiplier: float = 1.0
    init_bias_one: bool = False
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        if self.zero_init:
            w_init = lambda key, shape: jnp.zeros(shape)
        else:
            w_init = (lambda key, shape: jax.random.normal(key, shape) /
                      self.lr_multiplier)
        weight = self.param('weight', w_init, (self.out_channels, in_channels))
        gain = self.lr_multiplier / math.sqrt(in_channels)
        xd = x.astype(self.dtype)
        y = jnp.matmul(xd, (weight * gain).T.astype(self.dtype),
                       precision=_prec(xd),
                       preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            init = nn.initializers.ones if self.init_bias_one \
                else nn.initializers.zeros
            bias = self.param('bias', init, (self.out_channels,))
            y = y + (bias * self.lr_multiplier).astype(self.dtype)
        if self.activate:
            y = nn.leaky_relu(y * math.sqrt(2.0), 0.2)
        return y


class EqualizedConv2d(nn.Module):
    """Conv layer with runtime weight scaling and optional 2x resampling."""
    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activate: bool = False
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gain: float = 1.0):
        weight = self.param(
            'weight', nn.initializers.normal(1.0),
            (self.out_channels, self.in_channels, self.kernel_size,
             self.kernel_size))
        weight_gain = 1.0 / math.sqrt(self.in_channels * self.kernel_size**2)
        w = (weight * weight_gain).astype(self.dtype)
        x = conv_resampled2d(x.astype(self.dtype), w, f=bilinear_filter(),
                             up=self.up, down=self.down,
                             padding=self.kernel_size // 2)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.out_channels,))
            x = x + bias.reshape(1, -1, 1, 1).astype(self.dtype)
        act_gain = (math.sqrt(2.0) if self.activate else 1.0) * gain
        if act_gain != 1.0:
            x = x * act_gain
        if self.activate:
            x = nn.leaky_relu(x, 0.2)
        return x


def normalize_latent(x, axis=-1, eps=1e-8):
    return x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


class MappingNetwork(nn.Module):
    """z (+ optional c) -> w, broadcast to num_ws (stylegan.py:228-290)."""
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    lr_multiplier: float = 0.01
    normalize_c: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, c=None):
        x = None
        if self.z_dim > 0:
            x = normalize_latent(z.astype(self.dtype))
        if self.c_dim > 0:
            if self.normalize_c:
                y = normalize_latent(
                    EqualizedLinear(self.w_dim, dtype=self.dtype,
                                    name='embed')(c))
            else:
                y = c.astype(self.dtype)
            x = jnp.concatenate([x, y], axis=-1) if x is not None else y

        for idx in range(self.num_layers):
            x = EqualizedLinear(self.w_dim,
                                activate=True,
                                lr_multiplier=self.lr_multiplier,
                                dtype=self.dtype,
                                name=f'fc{idx}')(x)

        if self.num_ws is not None and x.ndim == 2:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)
        return x


class SynthesisLayer(nn.Module):
    """Modulated conv + noise + bias + lrelu (stylegan.py:293-356)."""
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: bool = False
    use_noise: bool = True
    activate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w, noise_mode='none', noise_rng=None, gain=1.0):
        styles = EqualizedLinear(self.in_channels, init_bias_one=True,
                                 dtype=self.dtype, name='affine')(w)
        weight = self.param(
            'weight', nn.initializers.normal(1.0),
            (self.out_channels, self.in_channels, self.kernel_size,
             self.kernel_size))

        noise = None
        if self.use_noise and noise_mode != 'none':
            noise_strength = self.param('noise_strength',
                                        nn.initializers.zeros, ())
            if noise_mode == 'random':
                assert noise_rng is not None
                if jnp.issubdtype(jnp.asarray(noise_rng).dtype,
                                  jnp.floating):
                    # Injected noise VALUES instead of a key — reference-
                    # trajectory replay of the per-layer torch.randn draws
                    # (reference stylegan.py:325-330).
                    noise = jnp.broadcast_to(
                        noise_rng.astype(jnp.float32),
                        (x.shape[0], 1, self.resolution,
                         self.resolution)) * noise_strength
                else:
                    noise = jax.random.normal(
                        noise_rng,
                        (x.shape[0], 1, self.resolution, self.resolution),
                        dtype=jnp.float32) * noise_strength
            elif noise_mode == 'const':
                noise_const = self.variable(
                    'buffers', 'noise_const',
                    lambda: jax.random.normal(
                        self.make_rng('params') if self.is_initializing()
                        else jax.random.PRNGKey(0),
                        (self.resolution, self.resolution)))
                noise = noise_const.value * noise_strength

        x = conv_modulated2d(x, weight.astype(self.dtype), styles,
                             noise=noise, up=self.up,
                             padding=self.kernel_size // 2,
                             resample_filter=bilinear_filter())
        bias = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        x = x + bias.reshape(1, -1, 1, 1).astype(self.dtype)
        act_gain = (math.sqrt(2.0) if self.activate else 1.0) * gain
        if act_gain != 1.0:
            x = x * act_gain
        if self.activate:
            x = nn.leaky_relu(x, 0.2)
        return x


class OutputLayer(nn.Module):
    """toRGB: modulated 1x1 conv without demodulation (stylegan.py:359-380)."""
    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w):
        weight_gain = 1.0 / math.sqrt(self.in_channels * self.kernel_size**2)
        styles = EqualizedLinear(self.in_channels, init_bias_one=True,
                                 dtype=self.dtype,
                                 name='affine')(w) * weight_gain
        weight = self.param(
            'weight', nn.initializers.normal(1.0),
            (self.out_channels, self.in_channels, self.kernel_size,
             self.kernel_size))
        x = conv_modulated2d(x, weight.astype(self.dtype), styles,
                             demodulate=False)
        bias = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        return x + bias.reshape(1, -1, 1, 1).astype(self.dtype)


class SynthesisBlock(nn.Module):
    """One resolution level: (up-)conv0, conv1, toRGB skip accumulation."""
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    use_noise: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, img, ws, noise_mode='none', noise_rngs=None):
        w_idx = 0

        def next_rng():
            return (noise_rngs.pop(0)
                    if noise_rngs and noise_mode == 'random' else None)

        if self.in_channels == 0:
            const = self.param(
                'const', nn.initializers.normal(1.0),
                (self.out_channels, self.resolution, self.resolution))
            x = jnp.broadcast_to(
                const[None].astype(self.dtype),
                (ws.shape[0],) + const.shape)
        else:
            x = SynthesisLayer(self.in_channels, self.out_channels,
                               w_dim=self.w_dim, resolution=self.resolution,
                               up=True, use_noise=self.use_noise,
                               dtype=self.dtype, name='conv0')(
                                   x, ws[:, w_idx], noise_mode, next_rng())
            w_idx += 1
        x = SynthesisLayer(self.out_channels, self.out_channels,
                           w_dim=self.w_dim, resolution=self.resolution,
                           use_noise=self.use_noise, dtype=self.dtype,
                           name='conv1')(x, ws[:, w_idx], noise_mode,
                                         next_rng())
        w_idx += 1

        if img is not None:
            img = upsample2d(img, bilinear_filter())
        y = OutputLayer(self.out_channels, self.img_channels,
                        w_dim=self.w_dim, dtype=self.dtype,
                        name='torgb')(x, ws[:, w_idx])
        img = img + y if img is not None else y
        return x, img


def synthesis_channels(img_resolution: int,
                       channel_base: int = 32768,
                       channel_max: int = 512):
    resolutions = [2**i for i in range(2, int(math.log2(img_resolution)) + 1)]
    channels = {r: min(channel_base // r, channel_max) for r in resolutions}
    return resolutions, channels


class SynthesisNetwork(nn.Module):
    """4x4 const -> img_resolution feature image (stylegan.py:438-490)."""
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    use_noise: bool = True
    dtype: Dtype = jnp.float32

    @property
    def num_ws(self) -> int:
        resolutions, _ = synthesis_channels(self.img_resolution,
                                            self.channel_base,
                                            self.channel_max)
        return sum(1 if r == 4 else 2 for r in resolutions) + 1

    @nn.compact
    def __call__(self, ws, noise_mode='none', noise_rng=None):
        resolutions, channels = synthesis_channels(self.img_resolution,
                                                   self.channel_base,
                                                   self.channel_max)
        num_layers = sum(1 if r == 4 else 2 for r in resolutions)
        if noise_rng is None:
            noise_rngs = None
        elif isinstance(noise_rng, (tuple, list)):
            # Per-layer injected noise values (trajectory replay); must
            # be one entry per noise-bearing conv layer, outermost first.
            noise_rngs = list(noise_rng)
            assert len(noise_rngs) == num_layers
        else:
            noise_rngs = list(jax.random.split(noise_rng, num_layers))

        x = img = None
        w_idx = 0
        for res in resolutions:
            in_ch = channels[res // 2] if res > 4 else 0
            n_conv = 1 if res == 4 else 2
            block_ws = ws[:, w_idx:w_idx + n_conv + 1]
            block_noise = ([noise_rngs.pop(0) for _ in range(n_conv)]
                           if noise_rngs is not None else None)
            x, img = SynthesisBlock(in_ch, channels[res], w_dim=self.w_dim,
                                    resolution=res,
                                    img_channels=self.img_channels,
                                    use_noise=self.use_noise,
                                    dtype=self.dtype, name=f'b{res}')(
                                        x, img, block_ws, noise_mode,
                                        block_noise)
            w_idx += n_conv
        return img


class DiscriminatorBlock(nn.Module):
    """Residual down block (stylegan.py:493-539)."""
    in_channels: int
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, img):
        if self.in_channels == 0:
            y = EqualizedConv2d(self.img_channels, self.tmp_channels, 1,
                                activate=True, dtype=self.dtype,
                                name='fromrgb')(img)
            x = x + y if x is not None else y
            img = None
        y = EqualizedConv2d(self.tmp_channels, self.out_channels, 1,
                            use_bias=False, down=True, dtype=self.dtype,
                            name='skip')(x, gain=math.sqrt(2.0) / 2.0)
        x = EqualizedConv2d(self.tmp_channels, self.tmp_channels, 3,
                            activate=True, dtype=self.dtype,
                            name='conv0')(x)
        x = EqualizedConv2d(self.tmp_channels, self.out_channels, 3,
                            activate=True, down=True, dtype=self.dtype,
                            name='conv1')(x, gain=math.sqrt(2.0) / 2.0)
        return y + x, img


def minibatch_std(x: jnp.ndarray, group_size: int,
                  num_channels: int = 1) -> jnp.ndarray:
    """Appends per-group feature stddev channels (stylegan.py:542-567).

    Group statistics are computed over the *local shard's* batch; under data
    parallelism each device keeps its own groups (same semantics as the
    reference's per-GPU DataParallel grouping, documented in SURVEY §7.3.7).
    """
    bs, nc, h, w = x.shape
    ng = group_size
    f = num_channels
    y = x.reshape(ng, bs // ng, f, nc // f, h, w).astype(jnp.float32)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(2, 3, 4))  # (bs // ng, f)
    y = y.reshape(-1, f, 1, 1).astype(x.dtype)
    y = jnp.tile(y, (ng, 1, h, w))
    return jnp.concatenate([x, y], axis=1)


class DiscriminatorOutput(nn.Module):
    """4x4 head with minibatch-std and projection conditioning."""
    in_channels: int
    cmap_dim: int
    resolution: int
    img_channels: int
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cmap):
        if self.mbstd_num_channels > 0:
            x = minibatch_std(x, self.mbstd_group_size,
                              self.mbstd_num_channels)
        x = EqualizedConv2d(self.in_channels + self.mbstd_num_channels,
                            self.in_channels, 3, activate=True,
                            dtype=self.dtype, name='conv')(x)
        x = EqualizedLinear(self.in_channels, activate=True, dtype=self.dtype,
                            name='fc')(x.reshape(x.shape[0], -1))
        x = EqualizedLinear(1 if self.cmap_dim == 0 else self.cmap_dim,
                            dtype=self.dtype, name='out')(x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1,
                        keepdims=True) / math.sqrt(self.cmap_dim)
        return x


class DiscriminatorBackbone(nn.Module):
    """Full conditional discriminator (stylegan.py:609-676)."""
    c_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    cmap_dim: Optional[int] = None
    mapping_lr_multiplier: float = 0.01
    mapping_num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, c=None):
        resolutions = [
            2**i for i in range(int(math.log2(self.img_resolution)), 2, -1)
        ]
        channels = {
            r: min(self.channel_base // r, self.channel_max)
            for r in resolutions + [4]
        }
        cmap_dim = self.cmap_dim if self.cmap_dim is not None else channels[4]
        if self.c_dim == 0:
            cmap_dim = 0

        x = None
        for res in resolutions:
            in_ch = channels[res] if res < self.img_resolution else 0
            x, img = DiscriminatorBlock(in_ch, channels[res],
                                        channels[res // 2], resolution=res,
                                        img_channels=self.img_channels,
                                        dtype=self.dtype,
                                        name=f'b{res}')(x, img)

        cmap = None
        if self.c_dim > 0:
            cmap = MappingNetwork(z_dim=0, c_dim=self.c_dim, w_dim=cmap_dim,
                                  num_ws=None,
                                  num_layers=self.mapping_num_layers,
                                  lr_multiplier=self.mapping_lr_multiplier,
                                  normalize_c=False, dtype=self.dtype,
                                  name='mapping')(None, c)
        return DiscriminatorOutput(channels[4], cmap_dim=cmap_dim,
                                   resolution=4,
                                   img_channels=self.img_channels,
                                   dtype=self.dtype, name='b4')(x, cmap)
