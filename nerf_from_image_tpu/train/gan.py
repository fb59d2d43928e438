"""GAN training: alternating G/D jitted steps over a data-parallel mesh.

TPU-first re-design of the reference training loop
(/root/reference/run.py:947-1193):

- The G-step and D-step are two pjit-compiled pure functions over a
  `GANTrainState` pytree; params replicated, batch sharded on the 'data'
  mesh axis; XLA inserts the gradient psum (the DataParallel equivalent).
- Lazy R1 (every other D step), progressive blur, TV/entropy/lr/ppl
  warmups, EMA with iteration-dependent decay, ADA probability control,
  and SDF beta/alpha clamping are all expressed in-graph from the
  iteration scalar so there is exactly one compilation per step type
  (+ one blur-free variant after warmup).
- The progressive blur uses a fixed-width masked kernel (static 61 taps,
  values computed in-graph from the iteration) instead of the reference's
  iteration-dependent kernel *size*, which would force ~300 recompiles.
- Minibatch-std groups are computed over the global batch (documented
  divergence from the reference's per-GPU groups; SURVEY §7.3.7).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from nerf_from_image_tpu.core import augment as augment_lib
from nerf_from_image_tpu.core import grids
from nerf_from_image_tpu.models.discriminator import Discriminator
from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.render import render

BLUR_WARMUP_ITERS = 12500
LR_WARMUP_ITERS = 2000
MAX_BLUR_HALF = 30  # static kernel half-width (sigma<=10 -> floor(30)=30)


def gan_loss(logits: jnp.ndarray, target_positive: bool) -> jnp.ndarray:
    """Non-saturating softplus GAN loss (run.py:353-362)."""
    x = -logits if target_positive else logits
    return jnp.mean(jax.nn.softplus(x))


def blur_kernel_dynamic(iteration: jnp.ndarray) -> jnp.ndarray:
    """Fixed-width progressive-blur kernel, values from the iteration scalar.

    Equals the reference kernel (lib/ops.py:42-49) zero-padded to 61 taps;
    when sigma -> 0 it degenerates to a delta (identity blur).
    """
    sigma = jnp.maximum(1.0 - iteration / BLUR_WARMUP_ITERS, 0.0) * 10.0
    size = jnp.floor(sigma * 3.0)
    x = jnp.arange(-MAX_BLUR_HALF, MAX_BLUR_HALF + 1, dtype=jnp.float32)
    active = (jnp.abs(x) <= size) & (size > 0)
    safe_sigma = jnp.maximum(sigma, 1e-8)
    f = jnp.exp2(-jnp.square(x / safe_sigma)) * active
    # Delta kernel when blur inactive.
    delta = (x == 0).astype(jnp.float32)
    f = jnp.where(size > 0, f, delta)
    return f / jnp.sum(f)


def blur_image(img_nchw: jnp.ndarray, iteration: jnp.ndarray,
               white_background: bool) -> jnp.ndarray:
    k = blur_kernel_dynamic(iteration)
    return grids.blur(img_nchw, k, white_background)


@flax.struct.dataclass
class GANTrainState:
    params_g: Any
    params_d: Any
    ema_params_g: Any
    opt_g: Any
    opt_d: Any
    iteration: jnp.ndarray  # scalar int32 (the global i; G even, D odd)
    rng: jax.Array
    augment_p: jnp.ndarray  # scalar f32 (effective ADA probability)
    ppl_running_avg: jnp.ndarray  # scalar f32
    # Second (unconditional-on-image) discriminator for
    # --dual_discriminator with --use_encoder (run.py:545-557). None when
    # single-D or when the second D shares parameters with the first.
    params_d2: Any = None
    opt_d2: Any = None


import dataclasses


@dataclasses.dataclass(frozen=True)
class GANConfig:
    """Static training configuration (closed over by the jitted steps)."""
    resolution: int = 128
    latent_dim: int = 512
    depth_samples_per_ray: int = 64
    fine_sampling: bool = True
    scene_range: float = 0.55
    white_background: bool = True
    camera_flipped: bool = False
    supervise_alpha: bool = False
    conditional_pose: bool = True
    use_sdf: bool = True
    attention_values: int = 10
    use_viewdir: bool = False
    is_highres: bool = False  # real images carry a 2x copy for ADA
    use_encoder: bool = False  # encoder-mode GAN: G conditioned on image
    use_class: bool = False  # class-conditional (CUB)
    num_classes: Optional[int] = None
    dual_discriminator: bool = False
    dual_discriminator_l1: bool = False  # D1 replaced by 10*L1 recon loss
    dual_discriminator_mse: bool = False  # D1 replaced by 10*MSE recon loss
    r1: float = 5.0
    tv: float = 0.5
    entropy: float = 0.05
    eikonal: float = 0.1
    path_length_regularization: bool = False
    augment_ada: bool = False
    augment_p_max: float = 0.0
    ada_target: float = 0.6
    clip_gradient_norm: float = 100.0
    lr_g: float = 0.0025
    lr_d: float = 0.002
    # The reference runs lr warmup only on fresh runs; a resumed run uses
    # the checkpoint's lr directly (run.py:668-676: `lr_warmup = False`
    # when resume_from is not None).
    lr_warmup: bool = True
    batch_size: int = 32
    use_pallas: bool = True  # windowed triplane sampler in train steps
    # Route the first-order SDF regularizer decodes (tv pair, entropy,
    # distance) through the windowed Pallas sampler too (A/B knob; see
    # Generator._stratified_windowed_decode). Default OFF: measured
    # 973 vs 904 ms g_step at the flagship point (PERF.md) — at ~30k
    # stratified points the index-bound XLA gather is cheap and the
    # kernel's launch + edge-pad overhead dominates; the windowed path
    # only pays at render-scale point counts (~2M).
    reg_windowed: bool = False
    # Windowed-sampler overflow-correction capacity (fraction of blocks;
    # models/generator.py). Raise for strongly zoomed-out cameras; the
    # g_step metric 'overflow_resid' (tag debug/overflow_resid) reports
    # any uncorrected points (0 => every training render is exact).
    overflow_capacity_frac: float = 1 / 64
    plane_resolution: int = 256  # StyleGAN synthesis output resolution
    channel_base: int = 32768  # StyleGAN channel scaling (both G and D)
    channel_max: int = 512
    ema_halflife_kimg: float = 10.0  # alpha = 0.5 ** (32 / 10000)
    # = not --disable_stylegan_noise: per-layer synthesis noise, enabled by
    # the cub / imagenet_elephant dataset overrides (data/loaders.py:93,106).
    use_stylegan_noise: bool = False


def make_models(cfg: GANConfig, dtype=jnp.float32):
    if cfg.path_length_regularization and cfg.use_sdf:
        import warnings
        warnings.warn(
            'path_length_regularization + SDF eikonal: the two '
            'second-order backward graphs in one XLA program trigger a '
            'known TPU pathology at full scale — g_step compiles in '
            '~2-4 min and steps run 15-70x slower (measured 17-70 s at '
            '128^2/batch 8; see PERF.md "PPL x eikonal pathology"). No '
            'reference dataset config enables this combination; results '
            'are correct (reference-trajectory-verified) but training '
            'throughput will be severely degraded.',
            stacklevel=2)
    gen = Generator(latent_dim=cfg.latent_dim, scene_range=cfg.scene_range,
                    attention_values=cfg.attention_values,
                    use_viewdir=cfg.use_viewdir, use_sdf=cfg.use_sdf,
                    use_encoder=cfg.use_encoder,
                    num_classes=cfg.num_classes if cfg.use_class else None,
                    use_pallas=cfg.use_pallas,
                    overflow_capacity_frac=cfg.overflow_capacity_frac,
                    use_stylegan_noise=cfg.use_stylegan_noise,
                    img_resolution=cfg.plane_resolution,
                    channel_base=cfg.channel_base,
                    channel_max=cfg.channel_max, dtype=dtype)
    disc = Discriminator(resolution=cfg.resolution,
                         nc=4 if cfg.supervise_alpha else 3,
                         camera_flipped=cfg.camera_flipped,
                         conditional_pose=cfg.conditional_pose,
                         use_encoder=cfg.use_encoder,
                         num_classes=cfg.num_classes if cfg.use_class
                         else None, channel_base=cfg.channel_base,
                         channel_max=cfg.channel_max, dtype=dtype)
    return gen, disc


def make_second_discriminator(cfg: GANConfig, dtype=jnp.float32):
    """The dual-discriminator setup (run.py:533-557): when D1 is
    image-conditional (use_encoder), D2 is a separate unconditional-on-
    image discriminator; otherwise D2 shares D1's parameters and just sees
    a second fresh batch. When dual_discriminator_l1/mse, D1 does not
    exist at all (a reconstruction loss takes its place)."""
    if not cfg.dual_discriminator:
        return None
    if not cfg.use_encoder:
        # Without an encoder, D2 == D1 (shared params over a second fresh
        # batch); if D1 was replaced by a recon loss, there is no D at all.
        if cfg.dual_discriminator_l1 or cfg.dual_discriminator_mse:
            return None
        return 'shared'
    return Discriminator(resolution=cfg.resolution,
                         nc=4 if cfg.supervise_alpha else 3,
                         camera_flipped=cfg.camera_flipped,
                         conditional_pose=cfg.conditional_pose,
                         use_encoder=False,
                         num_classes=cfg.num_classes if cfg.use_class
                         else None, channel_base=cfg.channel_base,
                         channel_max=cfg.channel_max, dtype=dtype)


def _lr_schedule(base_lr: float):
    """Linear warmup from lr/10 to lr over the first 1000 optimizer steps
    (run.py:662-678, 1181-1190: +delta per D iteration for warmup/2 steps)."""
    def sched(count):
        frac = jnp.minimum(count / (LR_WARMUP_ITERS / 2), 1.0)
        return base_lr / 10.0 + (base_lr - base_lr / 10.0) * frac
    return sched


def make_optimizers(cfg: GANConfig):
    lr_g = _lr_schedule(cfg.lr_g) if cfg.lr_warmup else cfg.lr_g
    lr_d = _lr_schedule(cfg.lr_d) if cfg.lr_warmup else cfg.lr_d
    opt_g = optax.chain(
        optax.clip_by_global_norm(cfg.clip_gradient_norm),
        optax.adam(lr_g, b1=0.0, b2=0.99),
    )
    opt_d = optax.chain(
        optax.clip_by_global_norm(cfg.clip_gradient_norm),
        optax.adam(lr_d, b1=0.0, b2=0.99),
    )
    return opt_g, opt_d


def restore_adam_moments(opt_state, mu, nu, count):
    """Writes converted torch-Adam moments into an optax chain state.

    ScaleByAdamState receives (count, mu, nu); every other inner state
    that tracks a ``count`` (the lr-warmup schedule) also receives the
    step count so warmup resumes where the reference run left off
    (reference run.py:883-884 loads the full optimizer state_dict)."""
    count = jnp.asarray(count, jnp.int32)
    mu = jax.tree_util.tree_map(jnp.asarray, mu)
    nu = jax.tree_util.tree_map(jnp.asarray, nu)
    found = []

    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            want = jax.tree_util.tree_structure(s.mu)
            got = jax.tree_util.tree_structure(mu)
            if want != got:
                raise ValueError(
                    'converted moment tree does not match the optimizer '
                    f'state structure: {got} vs {want}')
            found.append(s)
            return s._replace(count=count, mu=mu, nu=nu)
        if hasattr(s, '_fields'):  # other optax NamedTuple states
            return s._replace(count=count) if 'count' in s._fields else s
        if isinstance(s, tuple):
            return tuple(rec(x) for x in s)
        return s

    out = rec(opt_state)
    if not found:
        # Fail loud: a wrapped chain (optax.MultiSteps/masked/...) holds
        # the Adam state inside a NamedTuple field this walk does not
        # descend into — silently returning unchanged state would drop
        # the converted moments.
        raise ValueError('no ScaleByAdamState found in the optimizer state')
    return out


def init_train_state(rng: jax.Array, cfg: GANConfig,
                     dtype=jnp.float32) -> GANTrainState:
    gen, disc = make_models(cfg, dtype)
    rng, kg, kd, kd2 = jax.random.split(rng, 4)
    z = jnp.zeros((2, cfg.latent_dim))
    if cfg.use_encoder or cfg.use_class:
        # Conditional mapping: init the main graph with a dummy 512-D
        # conditioning, then create the embedding branch (image encoder or
        # class table) and merge its params in.
        params_g = gen.init(kg, z, jnp.zeros((2, 512)))
        if cfg.use_encoder:
            branch = gen.init(kg,
                              jnp.zeros((2, 3, cfg.resolution,
                                         cfg.resolution)),
                              method=Generator.embed_image)
        else:
            branch = gen.init(kg, jnp.zeros((2,), jnp.int32),
                              method=Generator.embed_class)
        params_g = {'params': {**params_g['params'], **branch['params']}}
    else:
        params_g = gen.init(kg, z)
    img = jnp.zeros((4, 4 if cfg.supervise_alpha else 3, cfg.resolution,
                     cfg.resolution))
    pose = jnp.broadcast_to(jnp.eye(4), (4, 4, 4)).at[:, 2, 3].set(4.0)
    focal = jnp.ones((4,)) * 1.2
    # With use_class, the D's `image` argument carries the class labels
    # (reference quirk: discriminator.py:64 label_embedding(image), and
    # num_classes takes precedence over the image embedding in the
    # conditioning chain at discriminator.py:66-78).
    cond_img = (jnp.zeros((4,), jnp.int32) if cfg.use_class else
                (jnp.zeros((4, 3, cfg.resolution, cfg.resolution))
                 if cfg.use_encoder else None))
    opt_g, opt_d = make_optimizers(cfg)
    if cfg.dual_discriminator_l1 or cfg.dual_discriminator_mse:
        params_d, opt_d_state = None, None
    else:
        params_d = disc.init(kd, img, pose, cond_img, focal)
        opt_d_state = opt_d.init(params_d)
    disc2 = make_second_discriminator(cfg)
    params_d2 = opt_d2_state = None
    if disc2 is not None and disc2 != 'shared':
        cond2 = (jnp.zeros((4,), jnp.int32) if cfg.use_class else None)
        params_d2 = disc2.init(kd2, img, pose, cond2, focal)
        opt_d2_state = opt_d.init(params_d2)
    return GANTrainState(
        params_g=params_g,
        params_d=params_d,
        ema_params_g=jax.tree_util.tree_map(lambda x: x, params_g),
        opt_g=opt_g.init(params_g),
        opt_d=opt_d_state,
        iteration=jnp.zeros((), jnp.int32),
        rng=rng,
        augment_p=jnp.zeros(()),
        ppl_running_avg=jnp.asarray(-1.0),  # <0 means "uninitialized"
        params_d2=params_d2,
        opt_d2=opt_d2_state,
    )


def _ema_alpha(iteration):
    """EMA decay with early-training acceleration (run.py:365-371)."""
    alpha = 0.5 ** (32.0 / 10000.0)
    power = jnp.where(iteration < 1000, 100.0,
                      jnp.where(iteration < 10000, 10.0, 1.0))
    return alpha ** power


def embed_condition(gen: Generator, params_g, cfg: GANConfig, batch):
    """G-conditioning embedding: image (encoder mode) or class label
    (run.py:918-927: z = (z_random, image) or (z_random, class))."""
    if cfg.use_encoder and 'image' in batch:
        img = batch['image'][..., :3].transpose(0, 3, 1, 2)
        return gen.apply(params_g, img, method=Generator.embed_image)
    if cfg.use_class and 'class' in batch:
        return gen.apply(params_g, batch['class'],
                         method=Generator.embed_class)
    return None


def generator_forward(gen: Generator, params_g, z, pose, focal, center,
                      bbox, cfg: GANConfig, rng, requests=(), cond=None,
                      noise=None):
    """Maps z, synthesizes, renders. Returns (RenderOutput, extra dict).

    `noise`: optional dict of precomputed noise arrays replacing the
    rng-derived draws (trajectory-parity injection; see
    tests/test_reference_trajectory.py). Recognized keys: 'depth',
    'pdf_u' (render), 'strata', 'perturb' (sdf_losses), 'ppl_planes',
    'ppl_attn' (path length).
    """
    rng_noise, rng_render, rng_reg, rng_sgnoise = jax.random.split(rng, 4)
    if noise is not None and 'sg_noise' in noise:
        # Injected per-layer StyleGAN noise values (trajectory replay of
        # the reference's torch.randn draws, stylegan.py:325-330) — a
        # tuple of (B, 1, res, res) arrays, outermost layer first.
        rng_sgnoise = noise['sg_noise']
    ws = gen.apply(params_g, z, cond, method=Generator.map)
    # Viewdirs are produced by the renderer; for viewdir models we render
    # with the normalized ray directions (set below via closure).
    # rng_sgnoise: fresh per-layer StyleGAN noise on every forward for
    # noise-enabled models (cub/imagenet_elephant; run.py default
    # noise_mode='random', stylegan.py:325). Ignored when the model was
    # built with use_stylegan_noise=False (all other datasets).
    state = gen.apply(params_g, ws, noise_rng=rng_sgnoise,
                      method=Generator.synthesize)

    def sample_fn(pts, reqs):
        # coord_grads=False: in the G/D steps poses/focals are input
        # DATA, so nothing trainable reaches the sample coordinates and
        # the windowed sampler's backward can skip its coordinate-
        # gradient matmuls (~3x cheaper backward kernel). CAUTION: if a
        # trainable pose source is ever threaded through this render
        # (the way invert/ optimizes pose), this flag silently zeroes
        # those gradients — it must then be dropped.
        return gen.apply(params_g, state, pts, reqs,
                         coord_grads=False, method=Generator.sample)

    render_rng = rng_render
    if noise is not None and ('depth' in noise or 'pdf_u' in noise):
        render_rng = {k: noise[k] for k in ('depth', 'pdf_u') if k in noise}
    # force_no_cam_grad: pose/focal are batch DATA in the G/D steps (the
    # reference's tensors are requires_grad=False, run.py:947-1010), so
    # every gradient path through ray-gen/depth math dies at a data leaf.
    # Cutting it at the source skips the dead (B,H,W,S,3) backward
    # broadcasts/muls instead of computing-then-discarding them.
    out = render(sample_fn, cfg.resolution, cfg.resolution, pose, focal,
                 center, bbox, cfg.scene_range, cfg.white_background,
                 cfg.depth_samples_per_ray, rng=render_rng,
                 fine_sampling=cfg.fine_sampling, force_no_cam_grad=True)

    extra = {}
    reg_requests = tuple(r for r in requests
                         if r in ('sdf_eikonal_loss', 'sdf_distance_loss',
                                  'total_variation_loss', 'entropy_loss'))
    if reg_requests:
        reg_rng = rng_reg
        if noise is not None and 'strata' in noise:
            reg_rng = {k: noise[k] for k in ('strata', 'perturb')
                       if k in noise}
        extra.update(
            gen.apply(params_g, state.planes, reg_rng, reg_requests,
                      method=Generator.sdf_losses,
                      dma_planes=state.dma_planes
                      if cfg.reg_windowed else None))

    if 'path_length' in requests:
        extra['path_length'] = compute_path_length(
            gen, params_g, ws, rng_noise, rng_sgnoise, noise)

    return out, extra


def compute_path_length(gen, params_g, ws, rng_noise, rng_sgnoise,
                        noise=None):
    """PPL: norm of d(sum(planes * noise) + sum(att * noise2))/d(ws)
    (generator.py:484-499) — jax.grad composes, no manual double-backward
    machinery needed. Returns (B,).

    Called from g_step in its OWN value_and_grad pass (not fused into the
    main loss): combining this double-backward with the SDF eikonal
    double-backward in one backward graph sends XLA into a compile
    pathology (>880 s compiles at the flagship point); disjoint backward
    graphs summed afterwards are mathematically identical (gradient of a
    sum) and compile normally. See PERF.md "PPL x eikonal pathology"."""
    k1, k2 = jax.random.split(rng_noise)

    def pl_target(ws_in):
        # Same noise as the main forward: the reference's PPL grad flows
        # through the one synthesis pass that already ran.
        st = gen.apply(params_g, ws_in, noise_rng=rng_sgnoise,
                       method=Generator.synthesize)
        if noise is not None and 'ppl_planes' in noise:
            n1 = noise['ppl_planes'].reshape(st.planes.shape)
        else:
            n1 = jax.random.normal(k1, st.planes.shape)
        n1 = n1 / math.sqrt(st.planes.shape[-2] * st.planes.shape[-1])
        total = jnp.sum(st.planes * n1)
        if st.attention_values is not None:
            if noise is not None and 'ppl_attn' in noise:
                n2 = noise['ppl_attn'].reshape(st.attention_values.shape)
            else:
                n2 = jax.random.normal(k2, st.attention_values.shape)
            total = total + jnp.sum(st.attention_values * n2)
        return total

    pl_grad = jax.grad(pl_target)(ws)
    return jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grad), axis=-1),
                             axis=-1))


def g_step(state: GANTrainState, batch: Dict[str, jnp.ndarray],
           gen: Generator, disc: Discriminator, opt_g,
           cfg: GANConfig, batch2: Optional[Dict[str, jnp.ndarray]] = None,
           disc2=None) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
    """One generator update (run.py:954-1073). batch: pose/focal/center/bbox.

    `batch['z']` is sampled on host (or pass rng-driven z). With
    `cfg.dual_discriminator`, `batch2` supplies the second fresh poses and
    `disc2` the second discriminator ('shared' -> same params as D1); the
    render is repeated with the same z/conditioning under the new poses and
    each adversarial loss is halved (run.py:962-1010).
    """
    i = state.iteration
    rng, rng_fwd, rng_fwd2, rng_aug, rng_aug2 = jax.random.split(state.rng, 5)

    pose, focal = batch['pose'], batch.get('focal')
    center, bbox = batch.get('center'), batch.get('bbox')

    # ADA pose/focal augmentation of the G batch (run.py:937-944: every
    # sampled batch goes through augment() when augment_p > 0; for the
    # G step only poses/focals exist, no image). In dual-L1/MSE mode the
    # idx-0 batch is the reconstruction target and is NOT augmented
    # (run.py:932-934).
    recon_mode = cfg.dual_discriminator_l1 or cfg.dual_discriminator_mse
    if cfg.augment_p_max > 0 and not recon_mode:
        # batch['aug_tform'] (optional AffineTransform): injected crop
        # transform for trajectory replay — replaces the rng_aug draw.
        _, pose, focal, _ = augment_lib.augment(
            rng_aug, None, pose, focal, state.augment_p,
            cfg.white_background, cached_tform=batch.get('aug_tform'))

    pose2 = focal2 = None
    if cfg.dual_discriminator and batch2 is not None:
        pose2, focal2 = batch2['pose'], batch2.get('focal')
        if cfg.augment_p_max > 0:
            _, pose2, focal2, _ = augment_lib.augment(
                rng_aug2, None, pose2, focal2, state.augment_p,
                cfg.white_background,
                cached_tform=batch2.get('aug_tform'))

    requests = []
    if cfg.use_sdf:
        requests.append('sdf_eikonal_loss')
    if cfg.tv > 0:
        requests.append('total_variation_loss')
    if cfg.entropy > 0:
        requests.append('entropy_loss')

    def loss_fn(params_g):
        cond = embed_condition(gen, params_g, cfg, batch)
        out, extra = generator_forward(gen, params_g, batch['z'], pose,
                                       focal, center, bbox, cfg, rng_fwd,
                                       tuple(requests), cond=cond,
                                       noise=batch.get('noise'))
        rgb = out.rgb
        if cfg.supervise_alpha:
            rgb = jnp.concatenate((rgb, out.mask[..., None]), axis=-1)
        img = rgb.transpose(0, 3, 1, 2)
        metrics = {}
        if out.overflow_resid is not None:
            # 0 => every point of this render was exact; >0 points
            # exceeded the windowed sampler's fixed correction capacity
            # (raise cfg.overflow_capacity_frac for such cameras).
            metrics['overflow_resid'] = out.overflow_resid
        if recon_mode:
            # D1 replaced by a 10x recon loss against the (blur-warmup)
            # conditioning image (run.py:992-999).
            z_img = batch['image'][..., :3].transpose(0, 3, 1, 2)
            z_img = blur_image(z_img, i, cfg.white_background)
            diff = img - z_img
            loss = 10.0 * (jnp.mean(jnp.square(diff))
                           if cfg.dual_discriminator_mse
                           else jnp.mean(jnp.abs(diff)))
        else:
            cond_d = (batch.get('class') if cfg.use_class else
                      (batch['image'][..., :3].transpose(0, 3, 1, 2)
                       if cfg.use_encoder else None))
            logits = disc.apply(state.params_d, img, pose, cond_d, focal)
            loss = gan_loss(logits, True)
        metrics['loss_g'] = loss
        if cfg.dual_discriminator:
            loss = loss / 2.0
            # Second pass: same z + conditioning, fresh unconditional
            # poses, second discriminator (run.py:963-1010).
            out2, _ = generator_forward(gen, params_g, batch['z'], pose2,
                                        focal2, batch2.get('center'),
                                        batch2.get('bbox'), cfg, rng_fwd2,
                                        (), cond=cond,
                                        noise=batch2.get('noise'))
            rgb2 = out2.rgb
            if cfg.supervise_alpha:
                rgb2 = jnp.concatenate((rgb2, out2.mask[..., None]),
                                       axis=-1)
            img2 = rgb2.transpose(0, 3, 1, 2)
            d2_params = (state.params_d if disc2 == 'shared'
                         else state.params_d2)
            d2_mod = disc if disc2 == 'shared' else disc2
            # D2 is unconditional on the IMAGE embedding but keeps class
            # conditioning when use_class (the reference passes None here,
            # run.py:1003-1004, which would crash its own num_classes D —
            # an unrunnable path upstream; we keep the labels).
            cond2 = batch2.get('class') if cfg.use_class else None
            logits2 = d2_mod.apply(d2_params, img2, pose2, cond2, focal2)
            loss2 = gan_loss(logits2, True)
            metrics['loss_g_uncond'] = loss2
            loss = loss + loss2 / 2.0

        if cfg.use_sdf:
            eik = jnp.mean(extra['sdf_eikonal_loss'])
            loss = loss + cfg.eikonal * eik
            metrics['loss_eikonal'] = eik
        warm = jnp.minimum(i / BLUR_WARMUP_ITERS, 1.0)
        if cfg.tv > 0:
            tv = jnp.mean(extra['total_variation_loss'])
            loss = loss + cfg.tv * warm * tv
            metrics['loss_tv'] = tv
        if cfg.entropy > 0:
            ent = jnp.mean(extra['entropy_loss'])
            loss = loss + cfg.entropy * warm * ent
            metrics['loss_entropy'] = ent
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params_g)

    ppl_avg = state.ppl_running_avg
    if cfg.path_length_regularization:
        # PPL penalty in its OWN value_and_grad, grads summed after:
        # gradient-of-a-sum semantics are identical to the reference's
        # single accumulated backward (run.py:1029-1044), but fusing this
        # double-backward with the eikonal double-backward in one
        # backward graph triggers an XLA compile pathology (see
        # compute_path_length / PERF.md). RNG splits mirror
        # generator_forward exactly so the noise draws (and the
        # trajectory-replay injection keys) are unchanged.
        def ppl_fn(params_g):
            cond = embed_condition(gen, params_g, cfg, batch)
            rng_noise, _, _, rng_sgnoise = jax.random.split(rng_fwd, 4)
            bnoise = batch.get('noise')
            if bnoise is not None and 'sg_noise' in bnoise:
                rng_sgnoise = bnoise['sg_noise']
            ws = gen.apply(params_g, batch['z'], cond,
                           method=Generator.map)
            ppl = compute_path_length(gen, params_g, ws, rng_noise,
                                      rng_sgnoise, batch.get('noise'))
            pl_decay = 0.01
            pl_weight = 2.0 * jnp.minimum(i / LR_WARMUP_ITERS, 1.0)
            avg0 = jnp.where(state.ppl_running_avg < 0, jnp.mean(ppl),
                             state.ppl_running_avg)
            # The reference updates the running average as a DETACHED
            # python float before forming the penalty
            # (run.py:1034-1038: `ppl_running_avg = pl_mean.item()`), so
            # no gradient flows through it — stop_gradient matches that;
            # a traced avg leaks a 0.01-coupled gradient through
            # mean(ppl) (measured: 7e-4 loss drift after one step).
            avg = jax.lax.stop_gradient(
                avg0 * (1 - pl_decay) + jnp.mean(ppl) * pl_decay)
            ppl_loss = jnp.mean(jnp.square(ppl - avg))
            return pl_weight * ppl_loss, (ppl_loss, avg)

        (_, (ppl_loss, ppl_avg)), ppl_grads = jax.value_and_grad(
            ppl_fn, has_aux=True)(state.params_g)
        grads = jax.tree_util.tree_map(jnp.add, grads, ppl_grads)
        metrics['loss_ppl'] = ppl_loss

    metrics['grad_norm_g'] = optax.global_norm(grads)

    updates, new_opt_g = opt_g.update(grads, state.opt_g, state.params_g)
    params_g = optax.apply_updates(state.params_g, updates)

    if cfg.use_sdf:
        # Clamp beta/alpha >= 1e-3 (run.py:1069-1071).
        p = params_g['params']
        p = dict(p)
        p['beta'] = jnp.maximum(p['beta'], 1e-3)
        p['alpha'] = jnp.maximum(p['alpha'], 1e-3)
        params_g = {**params_g, 'params': p}

    alpha = _ema_alpha(i)
    ema = jax.tree_util.tree_map(
        lambda e, p: e * alpha + p.astype(e.dtype) * (1 - alpha)
        if jnp.issubdtype(e.dtype, jnp.floating) else p,
        state.ema_params_g, params_g)

    new_state = state.replace(params_g=params_g, opt_g=new_opt_g,
                              ema_params_g=ema, rng=rng,
                              ppl_running_avg=ppl_avg,
                              iteration=i + 1)
    return new_state, metrics


def _prepare_d_real(state, batch, cfg, rng_aug, i, blur_active):
    """Real-phase input prep: ADA augment (+highres anti-alias) then blur
    warmup (run.py:937-944, 1090)."""
    pose_r, focal_r = batch['pose'], batch.get('focal')
    if cfg.augment_p_max > 0:
        use_highres = cfg.is_highres and 'image_highres' in batch
        img_in = (batch['image_highres'] if use_highres
                  else batch['image']).transpose(0, 3, 1, 2)
        img_aug, pose_r, focal_r, _ = augment_lib.augment(
            rng_aug, img_in, pose_r, focal_r, state.augment_p,
            cfg.white_background, cached_tform=batch.get('aug_tform'))
        if use_highres:
            b_, c_, h_, w_ = img_aug.shape
            img_aug = img_aug.reshape(b_, c_, h_ // 2, 2, w_ // 2,
                                      2).mean(axis=(3, 5))
        real_nchw = img_aug
    else:
        real_nchw = batch['image'].transpose(0, 3, 1, 2)
    if blur_active:
        real_nchw = blur_image(real_nchw, i, cfg.white_background)
    return real_nchw, pose_r, focal_r


def _render_fake(state, fake_batch, gen, cfg, rng_fake, rng_aug,
                 conditional):
    """Fake-phase render with frozen G (run.py:1121-1139); the G is
    conditioned on the fake batch's image/class when in encoder/class
    mode and this is the conditional discriminator's phase."""
    pose_f, focal_f = fake_batch['pose'], fake_batch.get('focal')
    if cfg.augment_p_max > 0:
        _, pose_f, focal_f, _ = augment_lib.augment(
            rng_aug, None, pose_f, focal_f, state.augment_p,
            cfg.white_background,
            cached_tform=fake_batch.get('aug_tform'))
    cond = (embed_condition(gen, state.params_g, cfg, fake_batch)
            if conditional else None)
    out_fake, _ = generator_forward(gen, state.params_g, fake_batch['z'],
                                    pose_f, focal_f,
                                    fake_batch.get('center'),
                                    fake_batch.get('bbox'), cfg, rng_fake,
                                    cond=cond,
                                    noise=fake_batch.get('noise'))
    rgb_fake = out_fake.rgb
    if cfg.supervise_alpha:
        rgb_fake = jnp.concatenate((rgb_fake, out_fake.mask[..., None]),
                                   axis=-1)
    return jax.lax.stop_gradient(rgb_fake.transpose(0, 3, 1, 2)), \
        pose_f, focal_f


def _d_phase_loss(disc_mod, params, real, fake, cond_real, cond_fake, cfg,
                  use_r1_now):
    """Real + R1 + fake losses for one discriminator (run.py:1090-1141)."""
    real_nchw, pose_r, focal_r = real
    fake_nchw, pose_f, focal_f = fake

    def d_real_logits(img):
        return disc_mod.apply(params, img, pose_r, cond_real, focal_r)

    logits_real = d_real_logits(real_nchw)
    loss_real = gan_loss(logits_real, True)

    grad_penalty = 0.0
    if use_r1_now:
        g = jax.grad(lambda im: jnp.sum(d_real_logits(im)))(real_nchw)
        grad_penalty = jnp.mean(
            jnp.sum(jnp.square(g.reshape(g.shape[0], -1)), axis=1))

    logits_fake = disc_mod.apply(params, fake_nchw, pose_f, cond_fake,
                                 focal_f)
    loss_fake = gan_loss(logits_fake, False)
    loss = loss_real + (cfg.r1 / 2.0) * grad_penalty + loss_fake
    return loss, loss_real, loss_fake, grad_penalty, \
        jnp.mean(jnp.sign(logits_real))


def d_step(state: GANTrainState, batch: Dict[str, jnp.ndarray],
           fake_batch: Dict[str, jnp.ndarray],
           gen: Generator, disc: Discriminator, opt_d, cfg: GANConfig,
           use_r1_now: bool, blur_active: bool,
           batch2: Optional[Dict[str, jnp.ndarray]] = None,
           fake_batch2: Optional[Dict[str, jnp.ndarray]] = None,
           disc2=None) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
    """One discriminator update (run.py:1074-1190).

    `batch` is the real-phase data; `fake_batch` supplies fresh poses + z
    for the fake phase. `use_r1_now` / `blur_active` are static (two
    compilations each). With `cfg.dual_discriminator`, `batch2` /
    `fake_batch2` feed the second (unconditional) discriminator; when
    `disc2 == 'shared'` both phases train the same parameters. The ADA
    controller listens to the UNCONDITIONAL discriminator
    (run.py:953, 1153).
    """
    i = state.iteration
    rng, rng_fake, rng_fake2, rng_aug_r, rng_aug_f, rng_aug_r2, \
        rng_aug_f2 = jax.random.split(state.rng, 7)

    recon_mode = cfg.dual_discriminator_l1 or cfg.dual_discriminator_mse
    has_d1 = not recon_mode
    has_d2 = cfg.dual_discriminator and disc2 is not None

    if has_d1:
        real1 = _prepare_d_real(state, batch, cfg, rng_aug_r, i,
                                blur_active)
        fake1_img, pose_f1, focal_f1 = _render_fake(
            state, fake_batch, gen, cfg, rng_fake, rng_aug_f,
            conditional=True)
        cond_real1 = (batch.get('class') if cfg.use_class else
                      (batch['image'][..., :3].transpose(0, 3, 1, 2)
                       if cfg.use_encoder else None))
        cond_fake1 = (fake_batch.get('class') if cfg.use_class else
                      (fake_batch['image'][..., :3].transpose(0, 3, 1, 2)
                       if cfg.use_encoder else None))
    if has_d2:
        b2 = batch2 if batch2 is not None else batch
        fb2 = fake_batch2 if fake_batch2 is not None else fake_batch
        real2 = _prepare_d_real(state, b2, cfg, rng_aug_r2, i, blur_active)
        fake2_img, pose_f2, focal_f2 = _render_fake(
            state, fb2, gen, cfg, rng_fake2, rng_aug_f2,
            conditional=cfg.use_encoder)  # G stays image-conditioned
        d2_mod = disc if disc2 == 'shared' else disc2

    shared = disc2 == 'shared'

    def loss_fn(params_d, params_d2):
        metrics = {}
        total = 0.0
        sign_uncond = jnp.zeros(())
        if has_d1:
            loss1, lr1, lf1, gp1, sign1 = _d_phase_loss(
                disc, params_d, real1, (fake1_img, pose_f1, focal_f1),
                cond_real1, cond_fake1, cfg, use_r1_now)
            suffix = '_cond' if has_d2 else ''
            metrics[f'loss_d_real{suffix}'] = lr1
            metrics[f'loss_d_fake{suffix}'] = lf1
            metrics['loss_r1'] = gp1
            total = total + loss1
            sign_uncond = sign1
        if has_d2:
            p2 = params_d if shared else params_d2
            cond_real2 = b2.get('class') if cfg.use_class else None
            cond_fake2 = fb2.get('class') if cfg.use_class else None
            loss2, lr2, lf2, gp2, sign2 = _d_phase_loss(
                d2_mod, p2, real2, (fake2_img, pose_f2, focal_f2),
                cond_real2, cond_fake2, cfg, use_r1_now)
            metrics['loss_d_real'] = lr2
            metrics['loss_d_fake'] = lf2
            metrics['loss_r1_uncond'] = gp2
            total = total + loss2
            sign_uncond = sign2  # ADA listens to the unconditional D
        metrics['sign_real'] = sign_uncond
        return total, metrics

    if has_d1 and has_d2 and not shared:
        (loss, metrics), (grads, grads2) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params_d,
                                                   state.params_d2)
    elif has_d1 or shared:
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params_d, state.params_d2)
        grads2 = None
    else:  # only a separate D2 exists (recon mode + encoder + dual)
        (loss, metrics), grads2 = jax.value_and_grad(
            lambda p2: loss_fn(None, p2), has_aux=True)(state.params_d2)
        grads = None

    params_d, new_opt_d = state.params_d, state.opt_d
    if grads is not None:
        metrics['grad_norm_d'] = optax.global_norm(grads)
        updates, new_opt_d = opt_d.update(grads, state.opt_d,
                                          state.params_d)
        params_d = optax.apply_updates(state.params_d, updates)
    params_d2, new_opt_d2 = state.params_d2, state.opt_d2
    if grads2 is not None:
        metrics['grad_norm_d2'] = optax.global_norm(grads2)
        updates2, new_opt_d2 = opt_d.update(grads2, state.opt_d2,
                                            state.params_d2)
        params_d2 = optax.apply_updates(state.params_d2, updates2)

    # ADA control every 4 D-steps (run.py:1147-1163). Note the reference
    # uses the INSTANTANEOUS sign of the current step's real logits at the
    # update iteration (run.py:1149: discriminated_real.detach().sign()
    # .mean() inside the `i % 8 == 7` branch), not an accumulated EMA —
    # this matches that exactly.
    augment_p = state.augment_p
    if cfg.augment_ada and cfg.augment_p_max > 0:
        ada_interval = 4
        is_update = (i % (2 * ada_interval)) == (2 * ada_interval - 1)
        ada_rampup = 500000.0
        delta = jnp.sign(metrics['sign_real'] - cfg.ada_target) * (
            cfg.batch_size * ada_interval) / ada_rampup
        new_p = jnp.clip(augment_p + delta, 0.0, cfg.augment_p_max)
        new_p = jnp.where(i < BLUR_WARMUP_ITERS, 0.0, new_p)
        augment_p = jnp.where(is_update, new_p, augment_p)

    new_state = state.replace(params_d=params_d, opt_d=new_opt_d,
                              params_d2=params_d2, opt_d2=new_opt_d2,
                              rng=rng, augment_p=augment_p,
                              iteration=i + 1)
    return new_state, metrics
