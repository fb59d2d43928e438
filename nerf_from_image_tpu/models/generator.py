"""Triplane SDF radiance-field generator (flax).

TPU-first re-design of /root/reference/models/generator.py: the StyleGAN2
synthesis emits a 96-channel feature image reshaped to three 32-channel
planes; point decoding (triplane gather + tiny MLP + Laplace-CDF SDF ->
density) is a pure function of (planes, coords) so the renderer can fuse
coarse/fine passes under one jit — the reference's Python `sampler` closure
becomes explicit functional state (`GeneratorState`).

The attention-values color mapping, view-direction MLP, conditional layer
norm, residual image encoder, and SDF regularizer losses are all ported;
double-backward paths (eikonal, normals) use jax.grad composition.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from nerf_from_image_tpu.core import grids
from nerf_from_image_tpu.models import stylegan
from nerf_from_image_tpu.ops import triplane as triplane_ops

Dtype = Any


def laplace_pdf(x, beta):
    return 0.5 * jnp.exp(-jnp.abs(x) / beta) / beta


def laplace_cdf(x, beta):
    return 0.5 + 0.5 * jnp.sign(x) * (1.0 - jnp.exp(-jnp.abs(x) / beta))


def wide_sigmoid_rescaled(x):
    """MipNeRF wide sigmoid rescaled to ~[-1, 1] (generator.py:36-39)."""
    return jax.nn.sigmoid(x) * 2.004 - 1.002


class ConditionalLayerNorm(nn.Module):
    """LayerNorm with latent-conditioned scale/shift (generator.py:42-60)."""
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        x = nn.LayerNorm(use_bias=False, use_scale=False,
                         dtype=self.dtype)(x)
        gamma = stylegan.EqualizedLinear(self.ch, dtype=self.dtype,
                                         name='fc_gamma')(z)
        beta = stylegan.EqualizedLinear(self.ch, dtype=self.dtype,
                                        name='fc_beta')(z)
        while beta.ndim < x.ndim:
            beta = beta[..., None, :]
            gamma = gamma[..., None, :]
        return beta + (1.0 + gamma) * x


class ResidualEncoder(nn.Module):
    """Image -> 512-D embedding for encoder-mode GANs (generator.py:63-129)."""
    use_instance_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Four stride-2 pools: below 16px the spatial dims collapse to
        # 0x0 and the final mean silently returns NaN.
        if x.shape[2] < 16 or x.shape[3] < 16:
            raise ValueError(
                f'ResidualEncoder needs input resolution >= 16, got '
                f'{x.shape[2]}x{x.shape[3]}')
        scale = math.sqrt(2.0) / 2.0
        relu = lambda v: nn.leaky_relu(v, 0.2)

        def norm(v, name):
            if not self.use_instance_norm:
                return v
            # InstanceNorm2d(affine=True) over spatial dims, NCHW.
            mean = jnp.mean(v, axis=(2, 3), keepdims=True)
            var = jnp.var(v, axis=(2, 3), keepdims=True)
            vhat = (v - mean) * jax.lax.rsqrt(var + 1e-5)
            g = self.param(f'{name}_scale', nn.initializers.ones,
                           (v.shape[1],))
            b = self.param(f'{name}_bias', nn.initializers.zeros,
                           (v.shape[1],))
            return vhat * g.reshape(1, -1, 1, 1) + b.reshape(1, -1, 1, 1)

        bias_mid = not self.use_instance_norm
        conv = lambda cin, cout, name, k=3, bias=True: stylegan.EqualizedConv2d(
            cin, cout, k, use_bias=bias, dtype=self.dtype, name=name)
        avgpool = lambda v: nn.avg_pool(
            v.transpose(0, 2, 3, 1), (2, 2), (2, 2)).transpose(0, 3, 1, 2)

        x = relu(conv(x.shape[1], 64, 'conv1')(x))
        x = relu(conv(64, 128, 'conv2')(x))
        x = avgpool(x)

        s = x
        x = relu(norm(conv(128, 128, 'conv3', bias=bias_mid)(x), 'norm3'))
        x = relu(norm(conv(128, 128, 'conv4', bias=bias_mid)(x), 'norm4'))
        x = avgpool(x + s) * scale

        s = conv(128, 256, 'shortcut', k=1, bias=False)(x)
        x = relu(norm(conv(128, 256, 'conv5', bias=bias_mid)(x), 'norm5'))
        x = relu(norm(conv(256, 256, 'conv6', bias=bias_mid)(x), 'norm6'))
        x = avgpool(x + s) * scale

        s = x
        x = relu(norm(conv(256, 256, 'conv7', bias=bias_mid)(x), 'norm7'))
        x = relu(norm(conv(256, 256, 'conv8', bias=bias_mid)(x), 'norm8'))
        x = avgpool(x + s) * scale

        x = relu(conv(256, 512, 'conv9')(x))
        x = relu(conv(512, 512, 'conv10')(x))
        return jnp.mean(x, axis=(2, 3))


class AttentionMapper(nn.Module):
    """w_tex -> K RGB palette values (generator.py:132-186)."""
    num_values: int
    hidden_size: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        scale = math.sqrt(2.0) / 2.0
        relu = lambda v: nn.leaky_relu(v, 0.2)
        const = self.param('const', nn.initializers.normal(1.0),
                           (1, self.hidden_size))
        x = jnp.broadcast_to(const.astype(self.dtype),
                             (c.shape[0], self.hidden_size))

        def fc(i):
            return stylegan.EqualizedLinear(self.hidden_size, use_bias=False,
                                            dtype=self.dtype, name=f'fc{i}')

        def cln(i, v):
            return ConditionalLayerNorm(self.hidden_size, dtype=self.dtype,
                                        name=f'norm{i}')(v, c)

        shortcut = x
        x = relu(cln(1, fc(1)(x)))
        x = relu(cln(2, fc(2)(x)))
        x = (x + shortcut) * scale

        shortcut = x
        x = relu(cln(3, fc(3)(x)))
        x = relu(cln(4, fc(4)(x)))
        x = (x + shortcut) * scale

        x = relu(stylegan.EqualizedLinear(self.hidden_size, dtype=self.dtype,
                                          name='fc5')(x))
        values = stylegan.EqualizedLinear(self.num_values * 3,
                                          dtype=self.dtype,
                                          name='fc_values')(x)
        return wide_sigmoid_rescaled(values.reshape(-1, self.num_values, 3))


class ViewDirectionMapper(nn.Module):
    """Per-ray view-direction features + output head (generator.py:189-253).

    `embed(viewdir)` gives (B, Rays, 1, F) features; `apply_features`
    composes them with per-sample decoder features and projects through a
    zero-initialized output layer.
    """
    output_size: int
    num_features: int = 32
    hidden_size: int = 64
    dtype: Dtype = jnp.float32

    def setup(self):
        mk = lambda i, use_bias: stylegan.EqualizedLinear(
            self.hidden_size, use_bias=use_bias, dtype=self.dtype,
            name=f'fc{i}')
        self.fc0 = mk(0, True)
        self.fc1 = mk(1, False)
        self.fc2 = mk(2, False)
        self.fc3 = mk(3, False)
        self.fc4 = mk(4, False)
        self.fc5 = mk(5, True)
        self.fc6 = stylegan.EqualizedLinear(self.num_features,
                                            dtype=self.dtype, name='fc6')
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.norm3 = nn.LayerNorm(dtype=self.dtype)
        self.norm4 = nn.LayerNorm(dtype=self.dtype)
        self.output = stylegan.EqualizedLinear(self.output_size,
                                               zero_init=True,
                                               dtype=self.dtype,
                                               name='output')

    def embed(self, viewdir):
        relu = lambda v: nn.leaky_relu(v, 0.2)
        scale = math.sqrt(2.0) / 2.0
        x = relu(self.fc0(viewdir))
        shortcut = x
        x = relu(self.norm1(self.fc1(x)))
        x = relu(self.norm2(self.fc2(x)))
        x = (x + shortcut) * scale
        shortcut = x
        x = relu(self.norm3(self.fc3(x)))
        x = relu(self.norm4(self.fc4(x)))
        x = (x + shortcut) * scale
        x = relu(self.fc5(x))
        return self.fc6(x)

    def apply_features(self, viewdir_embedding, features):
        """viewdir_embedding (..., 1, F) + decoder features (..., S, F)."""
        y = nn.leaky_relu(viewdir_embedding + features, 0.2)
        return self.output(y)

    def __call__(self, viewdir, features):
        return self.apply_features(self.embed(viewdir), features)


class TriplanarDecoder(nn.Module):
    """Triplane gather + 2-layer Softplus MLP (generator.py:288-331).

    The gather runs on a packed quad table (ops/triplane.py): one aligned
    128-lane row gather per point per plane instead of 12 narrow ones.
    `mlp()` is exposed separately so the windowed Pallas sampler
    (ops/pallas/triplane_window.py) can supply the gathered features.
    """
    num_input_features: int = 32
    num_output_features: int = 3
    hidden_dim: int = 64
    dtype: Dtype = jnp.float32

    def setup(self):
        self.fc0 = stylegan.EqualizedLinear(self.hidden_dim,
                                            dtype=self.dtype, name='fc0')
        self.fc1 = stylegan.EqualizedLinear(1 + self.num_output_features,
                                            dtype=self.dtype, name='fc1')

    def mlp(self, x):
        """Gathered triplane features (..., C) -> decoder outputs dict."""
        x = self.fc0(x)
        x = jax.nn.softplus(x)
        x = self.fc1(x)
        return {'features': x[..., 1:], 'density_or_distance': x[..., :1]}

    def __call__(self, packed_planes, coords, plane_resolution: int):
        """packed_planes (B, 3*R*R, 4C); coords (B, ..., 3) in [-1, 1].

        Returns dict(features (B, N, out), density_or_distance (B, N, 1)).
        """
        x = triplane_ops.sample_packed_triplane(packed_planes, coords,
                                                plane_resolution)
        return self.mlp(x)


@flax.struct.dataclass
class GeneratorState:
    """Functional equivalent of the reference's `sampler` closure state."""
    planes: jnp.ndarray  # (B, 3, 32, R, R)
    packed_planes: Optional[jnp.ndarray] = None  # (B, 3*R*R, 128)
    attention_values: Optional[jnp.ndarray] = None  # (B, K, 3)
    viewdir_embedding: Optional[jnp.ndarray] = None  # (B, Rays, 1, F)
    dma_planes: Optional[jnp.ndarray] = None  # (B, 3, R, R*C) bf16 (pallas)

    @property
    def plane_resolution(self) -> int:
        return self.planes.shape[-1]


class Generator(nn.Module):
    """Full radiance-field generator; see module docstring.

    Methods (use `module.apply(vars, ..., method=...)`):
      map(z, c=None)                 -> ws (B, num_ws, 512)
      synthesize(ws, ...)            -> GeneratorState
      decode(state, coords)          -> raw decoder outputs
      sample(state, x_in, requests)  -> dict of sampler outputs
      texture(w_tex)                 -> attention values
      embed_image(img)               -> encoder-mode embedding
    """
    latent_dim: int
    scene_range: float
    attention_values: int = 10
    use_viewdir: bool = False
    use_encoder: bool = False
    use_sdf: bool = True
    num_classes: Optional[int] = None
    img_resolution: int = 256
    # StyleGAN per-layer noise injection. The reference disables it by
    # default (arguments.py:150's always-True `--disable_stylegan_noise`
    # quirk) and re-enables it for cub / imagenet_elephant
    # (data/loaders.py:93,106); when enabled, every forward uses fresh
    # random noise (generator.py:472's 'const' branch is dead — no caller
    # sets freeze_noise). Here: noise_mode=None resolves to 'random' when
    # a noise_rng is supplied, else 'const' (deterministic jitted renders).
    use_stylegan_noise: bool = False
    # Windowed Pallas triplane sampler for structured (B, H, W, S, 3)
    # point grids (inference path; the VJP for training stays XLA).
    use_pallas: bool = False
    fuse_decode: bool = False  # in-kernel decoder tail (slower on v5e)
    # Fixed overflow-correction capacity of the windowed sampler, as a
    # fraction of total blocks (ops/pallas/triplane_window.py). The
    # default covers every reference dataset camera (objects fill the
    # bbox-cropped frame -> ~0% of blocks overflow); raise it for
    # strongly zoomed-out cameras (object <~40 px at 128^2), where the
    # per-tile ray spread exceeds the plane window and more blocks need
    # the exact XLA correction. sample() reports the uncorrected
    # residual as outputs['overflow_resid'] (0 => exact).
    overflow_capacity_frac: float = 1 / 64
    # StyleGAN channel scaling (stylegan.py:441-446 defaults); narrow
    # values give tiny-but-structurally-identical models for CPU parity
    # harnesses.
    channel_base: int = 32768
    channel_max: int = 512
    dtype: Dtype = jnp.float32

    def setup(self):
        c_dim = 512 if self.num_classes else 0
        w_dim = 512
        if self.use_encoder:
            self.emb = ResidualEncoder(use_instance_norm=True,
                                       dtype=self.dtype)
            c_dim = w_dim
        num_ws = 14 + (1 if self.attention_values > 0 else 0)
        self.num_ws = num_ws
        self.mapping_network = stylegan.MappingNetwork(
            z_dim=self.latent_dim, c_dim=c_dim, w_dim=w_dim, num_ws=num_ws,
            num_layers=2, lr_multiplier=0.01, normalize_c=False,
            dtype=self.dtype)
        self.synthesis_network = stylegan.SynthesisNetwork(
            w_dim=w_dim, img_resolution=self.img_resolution, img_channels=96,
            channel_base=self.channel_base, channel_max=self.channel_max,
            dtype=self.dtype)
        if self.use_viewdir:
            decoder_output_dim = 32
        elif self.attention_values > 0:
            decoder_output_dim = self.attention_values
        else:
            decoder_output_dim = 3
        self.decoder = TriplanarDecoder(32, decoder_output_dim,
                                        dtype=self.dtype)
        if self.use_viewdir:
            self.viewdir_mapper = ViewDirectionMapper(
                self.attention_values if self.attention_values > 0 else 3,
                32, dtype=self.dtype)
        if self.use_sdf:
            self.beta = self.param('beta',
                                   lambda k: jnp.asarray([0.1]))
            self.alpha = self.param('alpha',
                                    lambda k: jnp.asarray([1.0]))
        if self.attention_values > 0:
            self.texture_mapper = AttentionMapper(self.attention_values,
                                                  dtype=self.dtype)
        if self.num_classes:
            self.class_embedding = nn.Embed(self.num_classes, 512)

    # ---- Latent mapping -------------------------------------------------

    def map(self, z, c=None):
        return self.mapping_network(z, c)

    def embed_class(self, labels):
        return self.class_embedding(labels)

    def embed_image(self, img):
        return self.emb(img)

    def texture(self, w_tex):
        return self.texture_mapper(w_tex)

    def average_w(self, rng, n_samples: int = 10000):
        """Mean w over latent samples (generator.py:263-282, unconditional)."""
        z = jax.random.normal(rng, (n_samples, self.latent_dim))
        w = self.mapping_network(z, None)
        return jnp.mean(w, axis=0, keepdims=True)

    # ---- Synthesis -------------------------------------------------------

    def resolve_noise_mode(self, noise_mode, noise_rng):
        """noise_mode=None -> the model's construction-time policy (see the
        use_stylegan_noise field). Explicit modes pass through."""
        if noise_mode is not None:
            return noise_mode
        if not self.use_stylegan_noise:
            return 'none'
        return 'random' if noise_rng is not None else 'const'

    def synthesize_planes(self, ws, noise_mode=None, noise_rng=None):
        """ws for the synthesis backbone (first 14) -> triplanes."""
        noise_mode = self.resolve_noise_mode(noise_mode, noise_rng)
        planes = self.synthesis_network(ws, noise_mode=noise_mode,
                                        noise_rng=noise_rng)
        b = ws.shape[0]
        return planes.reshape(b, 3, 32, planes.shape[-2], planes.shape[-1])

    def synthesize(self, ws, viewdirs=None, noise_mode=None, noise_rng=None,
                   attention_values_override=None,
                   attention_values_bias=None):
        """Full forward to a GeneratorState (generator.py:407-503)."""
        if self.attention_values > 0:
            w_tex = ws[:, 14]
            w_synth = ws[:, :14]
            if attention_values_override is not None:
                att = attention_values_override
            else:
                att = self.texture_mapper(w_tex)
                if attention_values_bias is not None:
                    att = att + attention_values_bias
        else:
            w_synth = ws
            att = None
        planes = self.synthesize_planes(w_synth, noise_mode, noise_rng)
        dma_planes = None
        if self.use_pallas:
            # Pallas mode: the windowed sampler reads the DMA layout and
            # the overflow fixup gathers raw texels from it — the 4x-sized
            # quad table is never built (6.4 GB saved at batch 32/256^2).
            from nerf_from_image_tpu.ops.pallas import triplane_window
            dma_planes = triplane_window.plane_layout_for_dma(planes)
            packed = None
        else:
            packed = triplane_ops.pack_triplane(planes)
        vd_emb = None
        if self.use_viewdir and viewdirs is not None:
            vd = viewdirs.reshape(viewdirs.shape[0], -1, 1, 3)
            vd_emb = self.viewdir_mapper.embed(vd)
        return GeneratorState(planes=planes, packed_planes=packed,
                              attention_values=att,
                              viewdir_embedding=vd_emb,
                              dma_planes=dma_planes)

    # ---- Point decoding ---------------------------------------------------

    def decode(self, planes, coords):
        """Raw triplane decode; coords normalized to [-1, 1].

        Accepts either raw planes (B, 3, C, R, R) (packs on the fly) or a
        (packed_planes, resolution) tuple from GeneratorState.
        """
        if isinstance(planes, tuple):
            packed, r = planes
        else:
            packed = triplane_ops.pack_triplane(planes)
            r = planes.shape[-1]
        return self.decoder(packed, coords, r)

    def sdf_to_sigma(self, density_or_distance, out_of_bounds_mask):
        if self.use_sdf:
            beta = self.beta
            alpha = 1.0 / self.alpha
            neg_distance = -density_or_distance[..., -1]
            density_prealpha = laplace_cdf(neg_distance, beta) * (
                1.0 - out_of_bounds_mask)
            return alpha * density_prealpha
        density_pre = density_or_distance[..., -1] - 1.0
        return jax.nn.softplus(density_pre) * (1.0 - out_of_bounds_mask)

    def sample(self, state: GeneratorState, x_in,
               requests: Sequence[str] = ('sigma', 'rgb'),
               coord_grads: bool = True):
        """Evaluates the field at world points (generator.py:587-681).

        Args:
          state: GeneratorState from `synthesize`.
          x_in: (B, ..., S, 3) world-space points.
          requests: subset of {'sdf_distance', 'sigma', 'rgb', 'normals',
            'semantics', 'coords'}.

        Returns dict with values flattened over non-batch dims:
          sigma (B, N), rgb (B, N, 3 or K), etc.

        Contract: `sdf_distance` and `normals` are undefined for points
        outside the scene AABB (|x| > scene_range). The windowed Pallas
        sampler excludes such points from window placement and returns
        window-clamped rather than border-clamped texels for them, while
        the XLA quad-table path border-clamps; sigma/rgb are unaffected
        because out-of-box sigma is zeroed (rendering weights vanish),
        but per-point SDF/normal values at OOB points differ between the
        two paths and must not be consumed unweighted.
        """
        bs = x_in.shape[0]

        # NOTE: under jit an unused pack is dead-code-eliminated, so in
        # pallas mode (state.packed_planes is None) the quad table only
        # materializes for code paths that really read it (normals).
        packed = (state.packed_planes if state.packed_planes is not None
                  else triplane_ops.pack_triplane(state.planes))

        def decode_density(pts_flat):
            x = pts_flat.reshape(bs, 1, -1, 3) / self.scene_range
            return self.decode((packed, state.plane_resolution), x)

        x = x_in.reshape(bs, 1, -1, 3) / self.scene_range
        oob = jax.lax.stop_gradient(
            jnp.any(jnp.abs(x) > 1.0, axis=-1).astype(x.dtype).reshape(
                bs, -1))

        # Windowed Pallas sampler for structured point grids. Fully
        # differentiable (custom-VJP backward kernel incl. per-point
        # du/dv), so normals — a first-order point gradient of the
        # SDF — also route through it; only the second-order eikonal
        # path (sdf_losses) stays on the XLA quad-table decode.
        # The resident (double-buffered) kernel — the only windowed
        # variant with a VJP — needs two full plane sets in VMEM; above
        # that (plane_resolution > ~354 at C=32) sample_triplane_windowed
        # silently drops to the raw no-VJP pallas_call, which would fail
        # at trace time under jax.grad. Gate on the same fit condition
        # so oversized configs fall back to the XLA quad-table decode.
        _r = state.plane_resolution
        _c = state.planes.shape[-3] if state.planes is not None else 32
        resident_fit = 2 * (3 * _r * _r * _c * 2) <= 48 * 1024 * 1024
        use_windowed = (
            self.use_pallas and state.dma_planes is not None and
            x_in.ndim == 5 and
            x_in.shape[1] % 8 == 0 and x_in.shape[2] % 8 == 0 and
            x_in.shape[3] % 4 == 0 and
            resident_fit and
            state.plane_resolution >= 64)  # window must fit the plane

        outputs: Dict[str, jnp.ndarray] = {}
        if 'normals' in requests:
            # Normals = normalized gradient of the SDF wrt input points.
            if use_windowed:
                from nerf_from_image_tpu.ops.pallas import triplane_window

                def sdf_sum(pts):
                    # unblock=False: the sum is point-order-invariant, so
                    # the blocked->natural feature relayout is pure waste.
                    feats_n, _ = triplane_window.sample_triplane_windowed(
                        state.planes, state.dma_planes,
                        state.packed_planes, pts / self.scene_range,
                        unblock=False)
                    d = self.decoder.mlp(feats_n.astype(self.dtype))[
                        'density_or_distance']
                    return jnp.sum(d[..., -1])
            else:
                def sdf_sum(pts):
                    d = decode_density(pts)['density_or_distance']
                    return jnp.sum(d[..., -1])

            grad = jax.grad(sdf_sum)(x_in)
            norm = jnp.linalg.norm(grad, axis=-1, keepdims=True)
            outputs['normals'] = (grad / jnp.maximum(norm, 1e-12)).reshape(
                bs, -1, 3)
        fused_rgb = None
        reorder = None  # blocked->renderer point reorder (windowed path)
        if use_windowed:
            from nerf_from_image_tpu.ops.pallas import triplane_window
            # Deliberately UNclipped: prepare_blocks detects out-of-box
            # points (zero density downstream) and ignores them for
            # window placement; texel projection border-clamps anyway.
            coords_n = x_in / self.scene_range
            # Fully-fused variant: decoder MLP + attention softmax +
            # palette matmul run inside the kernel when only sigma/rgb
            # are needed (saves the feature HBM round-trip and two
            # bandwidth-bound XLA stages).
            # Measured on v5e: in-kernel decode fusion LOSES ~10%
            # (three extra ~0.5us small matmuls per block outweigh the
            # ~30ms of XLA stages saved) — keep it available but off.
            fuse_decode = (self.fuse_decode and
                           self.attention_values > 0 and
                           not self.use_viewdir and
                           state.attention_values is not None and
                           set(requests) <= {'sigma', 'rgb',
                                             'sdf_distance'})
            if fuse_decode:
                dp = self.variables['params']['decoder']
                w0 = (dp['fc0']['weight'] *
                      (1.0 / math.sqrt(dp['fc0']['weight'].shape[1]))).T
                w1 = (dp['fc1']['weight'] *
                      (1.0 / math.sqrt(dp['fc1']['weight'].shape[1]))).T
                decode = {
                    'w0': w0, 'b0': dp['fc0']['bias'],
                    'w1': w1, 'b1': dp['fc1']['bias'],
                    'palette': state.attention_values,
                }
                out4, _resid = triplane_window.sample_triplane_windowed(
                    state.planes, state.dma_planes, state.packed_planes,
                    coords_n, decode=decode, coord_grads=coord_grads,
                    overflow_capacity_frac=self.overflow_capacity_frac)
                dec = {'density_or_distance': out4[..., :1].astype(
                    self.dtype), 'features': None}
                fused_rgb = out4[..., 1:].astype(self.dtype)
            else:
                # unblock=False keeps the kernel's blocked point order
                # through the pointwise decoder MLP; only the small
                # decoded outputs (1-ch distance, 3-ch rgb, K-ch probs)
                # are reordered to renderer order below. Reordering the
                # (N, 32) features themselves materializes three 4x-
                # padded T(8,128) copies (measured 12 GB of the 17.6 GB
                # batch-16 OOM) — on the decoded tensors XLA lays the
                # point axis minor and the transpose is pad-free.
                feats, _resid = triplane_window.sample_triplane_windowed(
                    state.planes, state.dma_planes, state.packed_planes,
                    coords_n, coord_grads=coord_grads, unblock=False,
                    overflow_capacity_frac=self.overflow_capacity_frac)
                dec = self.decoder.mlp(feats.astype(self.dtype))
                _h, _w, _s = x_in.shape[1], x_in.shape[2], x_in.shape[3]
                reorder = lambda t: triplane_window.unblock_points(
                    t, _h, _w, _s)
        else:
            dec = decode_density(x_in)
        if use_windowed:
            # Uncorrected overflow count (scalar int32; 0 => the windowed
            # result is exact). Surfaced so callers can log/warn instead
            # of silently consuming an inexact render when a zoomed-out
            # camera exceeds overflow_capacity_frac.
            outputs['overflow_resid'] = _resid
        density_or_distance = dec['density_or_distance']
        features = dec['features']
        if reorder is not None:
            density_or_distance = reorder(density_or_distance)

        if 'sdf_distance' in requests:
            outputs['sdf_distance'] = density_or_distance

        if 'sigma' in requests:
            outputs['sigma'] = self.sdf_to_sigma(density_or_distance, oob)

        if 'coords' in requests:
            outputs['coords'] = x_in.reshape(bs, -1, 3)

        if fused_rgb is not None:
            if 'rgb' in requests:
                outputs['rgb'] = fused_rgb
            return outputs

        if 'rgb' in requests or 'semantics' in requests:
            if self.use_viewdir and state.viewdir_embedding is not None:
                if reorder is not None:
                    # The per-ray viewdir embedding broadcast needs
                    # renderer (ray-major) order.
                    features = reorder(features)
                    reorder = None
                s = x_in.shape[-2]
                feat = features.reshape(bs, -1, s, features.shape[-1])
                feat = self.viewdir_mapper.apply_features(
                    state.viewdir_embedding, feat)
                features = feat.reshape(bs, -1, feat.shape[-1])
            if self.attention_values == 0:
                rgb = wide_sigmoid_rescaled(features)
                if 'rgb' in requests:
                    outputs['rgb'] = rgb if reorder is None else reorder(rgb)
            else:
                # Softmax + palette matmul are pointwise over points, so
                # they run in whatever order `features` is in; only the
                # small outputs get reordered.
                attention_probs = jax.nn.softmax(features, axis=-1)
                if 'semantics' in requests:
                    outputs['semantics'] = (attention_probs if reorder is
                                            None else
                                            reorder(attention_probs))
                if 'rgb' in requests:
                    rgb = jnp.matmul(attention_probs,
                                     state.attention_values)
                    outputs['rgb'] = rgb if reorder is None else reorder(rgb)
        return outputs

    # ---- Regularizer losses -------------------------------------------------

    def sdf_losses(self, planes, rng,
                   requests: Sequence[str] = ('sdf_eikonal_loss',),
                   nstrata: int = 32, dma_planes=None):
        """Eikonal/distance/TV/entropy losses on stratified volume samples
        (generator.py:505-585).

        `rng` may be a dict of precomputed noise {'strata': uniform
        (B, n, n, n, 3), 'perturb': normal (B, N, 3)} — trajectory-parity
        injection of the reference's torch.rand_like/randn_like draws
        (ops.py:25, generator.py:553-555).

        `dma_planes`: optional (B, 3, R, R*C) bf16 DMA layout. When given
        (and the geometry fits), the FIRST-ORDER decodes (tv pair,
        entropy, distance target) route through the windowed Pallas
        sampler: the stratified grid is spatially structured — a 4x4x4
        cell block's footprint is (tile+1)*(R-1)/n + 2 taps ~= 43 texels
        at n=31/R=256, inside the 48-col window — so the index-bound XLA
        gather (~13.7 ns/row) is avoidable. Only the eikonal term, whose
        g_step gradient is second-order (grad-of-grad, beyond the
        sampler's first-order custom VJP), stays on the quad-table path.
        """
        bs = planes.shape[0]
        if isinstance(rng, dict):
            rng_strata = rng['strata']
            rng_perturb = rng.get('perturb')
        else:
            rng_strata, rng_perturb = jax.random.split(rng)
        bins_in = grids.sample_volume_stratified(rng_strata, bs, nstrata,
                                                 self.scene_range)
        outputs = {}

        def decode_d(pts):
            coords = (pts / self.scene_range).reshape(bs, 1, -1, 3)
            return self.decode(planes, coords)['density_or_distance'][..., -1]

        n = nstrata - 1
        decode_fo, mean_fo, block_fo = self._stratified_windowed_decode(
            planes, dma_planes, n)
        if decode_fo is None:
            decode_fo = decode_d
            mean_fo = lambda x: jnp.mean(x.reshape(bs, -1), axis=1)
            block_fo = lambda x: x

        if 'sdf_eikonal_loss' in requests:
            grad = jax.grad(lambda p: jnp.sum(decode_d(p)))(bins_in)
            sdf_magnitude = jnp.linalg.norm(grad, axis=-1)
            outputs['sdf_eikonal_loss'] = jnp.mean(
                jnp.square(sdf_magnitude - 1.0).reshape(bs, -1), axis=1)

        d = decode_fo(bins_in)

        if 'sdf_distance_loss' in requests:
            # target in the SAME point order as d (blocked under the
            # windowed path — the loss pairs them elementwise).
            target = jax.lax.stop_gradient(
                block_fo(jnp.linalg.norm(bins_in, axis=-1) - 1.0))
            outputs['sdf_distance_loss'] = mean_fo(
                jnp.square(d.reshape(bs, -1) - target.reshape(bs, -1)))

        if 'total_variation_loss' in requests or 'entropy_loss' in requests:
            if 'total_variation_loss' in requests:
                if rng_perturb is not None and \
                        jnp.issubdtype(rng_perturb.dtype, jnp.floating):
                    pn = rng_perturb.reshape(bins_in.shape)
                else:
                    pn = jax.random.normal(rng_perturb, bins_in.shape)
                perturbed = jax.lax.stop_gradient(bins_in) + \
                    pn * 0.004 * self.scene_range
                # Same blocking as d: |pre - pre_p| pairs pointwise.
                d_perturb = decode_fo(perturbed)
            if self.use_sdf:
                beta = self.beta
                if 'total_variation_loss' in requests:
                    pre = laplace_cdf(-d, beta)
                    pre_p = laplace_cdf(-d_perturb, beta)
                    outputs['total_variation_loss'] = mean_fo(
                        jnp.abs(pre - pre_p))
                if 'entropy_loss' in requests:
                    outputs['entropy_loss'] = mean_fo(laplace_pdf(-d, beta))
            else:
                tv_term = jax.nn.sigmoid(d - 1.0)
                if 'total_variation_loss' in requests:
                    tv_p = jax.nn.sigmoid(d_perturb - 1.0)
                    outputs['total_variation_loss'] = mean_fo(
                        jnp.abs(tv_term - tv_p))
                if 'entropy_loss' in requests:
                    outputs['entropy_loss'] = mean_fo(
                        tv_term * (1.0 - tv_term))
        return outputs

    def _stratified_windowed_decode(self, planes, dma_planes, n):
        """First-order stratified-grid decode through the windowed Pallas
        sampler (see sdf_losses). Returns (decode, masked_mean, block) or
        (None, None, None) when the geometry doesn't fit.

        The n^3 grid is edge-padded to a multiple of the 4x4x4 block and
        decoded in the kernel's blocked point order; `masked_mean`
        excludes the pad points, `block` maps a flat (B, n^3, ...) tensor
        into the same blocked order (for elementwise pairing)."""
        tile = slab = 4
        if dma_planes is None or not self.use_pallas or n < tile:
            return None, None, None
        r = dma_planes.shape[-2]
        footprint = (tile + 1) * (r - 1) / n + 2.0
        from nerf_from_image_tpu.ops.pallas import triplane_window as tw
        resident_fit = 2 * dma_planes[0].size * 2 <= 48 * 1024 * 1024
        if (footprint > min(tw.WIN, tw.WIN_Y) or r < 64 or
                not resident_fit):
            return None, None, None
        bs = planes.shape[0]
        npad = -(-n // tile) * tile
        pad = npad - n
        nb_side = npad // tile
        p = tile * tile * slab

        def block_padded(g):
            """(B, npad, npad, npad, ...) -> blocked (B, NB*P, ...)
            (prepare_blocks' block transpose)."""
            trail = g.shape[4:]
            g = g.reshape((g.shape[0], nb_side, tile, nb_side, tile,
                           nb_side, slab) + trail)
            g = jnp.moveaxis(g, (2, 4), (4, 5))  # -> (b,ht,wt,ks,t,t,s,..)
            return g.reshape((g.shape[0], nb_side ** 3 * p) + trail)

        def block(x):
            """(B, n^3, ...) flat grid tensor -> blocked, edge-padded."""
            trail = x.shape[2:]
            g = x.reshape((bs, n, n, n) + trail)
            g = jnp.pad(g, ((0, 0), (0, pad), (0, pad), (0, pad)) +
                        ((0, 0),) * len(trail), mode='edge')
            return block_padded(g)

        def decode(pts):
            # NATURAL padded grid in: the sampler blocks internally with
            # the same tile/slab transpose block_padded replicates, so
            # its unblock=False output pairs positionally with block()'d
            # tensors.
            g = pts.reshape(bs, n, n, n, 3)
            g = jnp.pad(g, ((0, 0), (0, pad), (0, pad), (0, pad), (0, 0)),
                        mode='edge')
            feats, _ = tw.sample_triplane_windowed(
                planes, dma_planes, None, g / self.scene_range,
                tile=tile, slab=slab, coord_grads=False, unblock=False)
            return self.decoder.mlp(
                feats.astype(self.dtype))['density_or_distance'][..., -1]

        real = jnp.pad(jnp.ones((1, n, n, n), jnp.float32),
                       ((0, 0), (0, pad), (0, pad), (0, pad)))
        mask = block_padded(real)  # (1, NB*P), 0 on pad points
        denom = float(n ** 3)

        def masked_mean(x):
            return jnp.sum(x.reshape(bs, -1) * mask, axis=1) / denom

        return decode, masked_mean, block

    def __call__(self, z, c=None):
        """Init-friendly forward: maps z and synthesizes a state."""
        ws = self.map(z, c)
        state = self.synthesize(ws)
        if self.use_viewdir:
            # Touch viewdir params so init creates them.
            _ = self.viewdir_mapper.embed(
                jnp.zeros((z.shape[0], 1, 1, 3), self.dtype))
        probe = jnp.zeros((z.shape[0], 8, 1, 3), self.dtype)
        _ = self.sample(state, probe, ('sigma', 'rgb'))
        return state
