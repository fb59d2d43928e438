"""GAN training evaluation: FID + reconstruction metrics + image logging.

Parity with the reference evaluation block (/root/reference/run.py:385-499,
1195-1472):

- Frozen real-data Inception statistics are computed once at setup (and
  cached to disk) from the train-eval split — `compute_real_fid_stats`
  (run.py:385-403).
- `eval_indices` / `eval_indices_perm` / the frozen `z_fid_untrunc` latents
  follow the reference protocol (seed 1234, <=8000 images, novel-view
  permutation within objects; run.py:416-499).
- `evaluate()` renders the eval set with the EMA generator, computes
  FID (untruncated) for unconditional models, recon PSNR/SSIM/LPIPS/IoU
  (front + random view) for encoder-mode models, logs the reference's
  scalar/image tensorboard families, and returns the current FID so the
  train loop can gate `checkpoint_best` (run.py:1403-1405, 1511-1513).

TPU notes: rendering runs in fixed-size jitted batches (straggler batches
are padded and the padded rows masked out of all statistics — the
reference instead falls back to bs=1, run.py:1227-1234); metrics are
computed on-device and only scalars/activations cross to the host.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.metrics import fid as fid_lib
from nerf_from_image_tpu.metrics import image as image_metrics
from nerf_from_image_tpu.models.generator import Generator
from nerf_from_image_tpu.render import render
from nerf_from_image_tpu.utils.io import get_color_palette

N_IMAGES_FID_MAX = 8000  # Pix2NeRF protocol (run.py:413-414).


def compute_eval_indices(n_images: int, dataset_name: str,
                         rng: np.random.RandomState) -> np.ndarray:
    """Eval image indices (run.py:416-437)."""
    if n_images > N_IMAGES_FID_MAX:
        return np.sort(rng.permutation(n_images)[:N_IMAGES_FID_MAX])
    if dataset_name.startswith('imagenet_'):
        out = []
        remaining = n_images
        while remaining > 0:
            out.append(rng.permutation(n_images)[:remaining])
            remaining -= len(out[-1])
        return np.sort(np.concatenate(out))
    return np.arange(n_images)


def compute_view_perm(indices: np.ndarray, views_per_object: Optional[int],
                      rng: np.random.RandomState) -> np.ndarray:
    """Novel-view permutation: same object, different view (run.py:441-476)."""
    if not views_per_object or views_per_object == 1:
        return indices[rng.permutation(len(indices))]
    obj_index: Dict[int, list] = {}
    for idx in indices:
        obj_index.setdefault(int(idx) // views_per_object, []).append(int(idx))
    perm = []
    for idx in indices:
        views = obj_index[int(idx) // views_per_object]
        if len(views) == 1:
            perm.append(views[0])
            continue
        while True:
            tentative = int(rng.randint(len(views)))
            if views[tentative] != int(idx):
                perm.append(views[tentative])
                break
    return np.asarray(perm, dtype=np.int64)


class GANEvaluator:
    """Periodic training evaluation (construct once, call per eval step)."""

    def __init__(self,
                 cfg,
                 dataset_config: dict,
                 dataset_name: str,
                 train_split,
                 train_eval_split,
                 test_split=None,
                 inception_apply: Optional[Callable] = None,
                 lpips_apply: Optional[Callable] = None,
                 use_encoder: bool = False,
                 use_class: bool = False,
                 eval_batch_size: int = 8,
                 stats_cache_dir: Optional[str] = None,
                 seed: int = 1234):
        self.cfg = cfg
        self.dataset_config = dataset_config
        self.dataset_name = dataset_name
        self.train_split = train_split
        self.train_eval_split = train_eval_split
        self.test_split = test_split
        self.inception_apply = inception_apply
        self.lpips_apply = lpips_apply
        self.use_encoder = use_encoder
        self.use_class = use_class
        self.eval_bs = eval_batch_size
        self.stats_cache_dir = stats_cache_dir
        self.best_fid = float('inf')
        self._render_fn = None
        # Trajectory-replay hook: when set, called once per rendered eval
        # batch (in evaluation order) and must return the render() noise
        # dict {'depth': ..., 'pdf_u': ...} — the injected equivalents of
        # the reference's per-render torch.rand draws.
        self.render_noise_provider = None

        rng = np.random.RandomState(seed)
        n = len(train_eval_split.images)
        if train_eval_split.eval_indices is None:
            train_eval_split.eval_indices = compute_eval_indices(
                n, dataset_name, rng)
        if getattr(train_eval_split, 'eval_indices_perm', None) is None:
            train_eval_split.eval_indices_perm = compute_view_perm(
                train_eval_split.eval_indices,
                dataset_config.get('views_per_object'), rng)
        if test_split is not None and dataset_config.get(
                'views_per_object_test'):
            test_split.eval_indices = np.arange(len(test_split.images))
            if len(test_split.eval_indices) > N_IMAGES_FID_MAX:
                test_split.eval_indices = np.sort(
                    rng.permutation(
                        len(test_split.images))[:N_IMAGES_FID_MAX])
            test_split.eval_indices_perm = compute_view_perm(
                test_split.eval_indices,
                dataset_config['views_per_object_test'], rng)

        # Frozen eval latents (re-seeded like run.py:491).
        rng2 = np.random.RandomState(seed)
        self.z_fid = rng2.randn(
            len(train_eval_split.eval_indices),
            cfg.latent_dim).astype(np.float32)
        if (test_split is not None and
                test_split.eval_indices is not None):
            self.z_fid_test = rng2.randn(
                len(test_split.eval_indices),
                cfg.latent_dim).astype(np.float32)
        else:
            self.z_fid_test = None

    # ---- Real-data Inception statistics ---------------------------------

    def _stats_cache_path(self, tag: str) -> Optional[str]:
        if self.stats_cache_dir is None:
            return None
        return os.path.join(self.stats_cache_dir,
                            f'fid_stats_{self.dataset_name}_{tag}.npz')

    def real_stats(self, split, tag: str):
        """Computes (and caches) Inception stats for a split's real images."""
        if split.fid_stats is not None:
            return split.fid_stats
        if self.inception_apply is None:
            return None
        from nerf_from_image_tpu.utils import io as io_lib
        path = self._stats_cache_path(tag)
        if path is not None and io_lib.file_exists(path):
            data = io_lib.load_npz(path)
            split.fid_stats = (data['mu'], data['sigma'])
            return split.fid_stats
        acts = []
        images = split.images
        bs = self.eval_bs
        for i in range(0, len(images), bs):
            im = images[i:i + bs]
            pad = bs - len(im)
            if pad:
                im = np.concatenate([im, np.repeat(im[-1:], pad, 0)], 0)
            im = jnp.asarray(im[..., :3].transpose(0, 3, 1, 2)) / 2 + 0.5
            a = np.asarray(self.inception_apply(im))
            acts.append(a[:bs - pad] if pad else a)
        acts = np.concatenate(acts, 0)
        split.fid_stats = fid_lib.calculate_stats(acts)
        if path is not None:
            io_lib.save_npz(path, mu=split.fid_stats[0],
                            sigma=split.fid_stats[1])
        return split.fid_stats

    # ---- Rendering -------------------------------------------------------

    def _make_render_fn(self, gen: Generator):
        cfg = self.cfg

        def forward(ema_params, z, pose, focal, center, bbox, image_emb,
                    class_label, noise_rng, compute_normals,
                    compute_semantics, render_rng=None):
            c = None
            if self.use_encoder and image_emb is not None:
                c = gen.apply(ema_params, image_emb,
                              method=Generator.embed_image)
            elif self.use_class and class_label is not None:
                c = gen.apply(ema_params, class_label,
                              method=Generator.embed_class)
            ws = gen.apply(ema_params, z, c, method=Generator.map)
            # noise_rng: fresh per-batch StyleGAN noise for noise-enabled
            # models (the reference's eval renders run the default
            # noise_mode='random' forward); dead input otherwise.
            state = gen.apply(ema_params, ws, noise_rng=noise_rng,
                              method=Generator.synthesize)

            def sample_fn(pts, reqs):
                return gen.apply(ema_params, state, pts, reqs,
                                 method=Generator.sample)

            out = render(sample_fn, cfg.resolution, cfg.resolution, pose,
                         focal, center, bbox, cfg.scene_range,
                         cfg.white_background, cfg.depth_samples_per_ray,
                         rng=render_rng, fine_sampling=cfg.fine_sampling,
                         compute_normals=compute_normals,
                         compute_semantics=compute_semantics,
                         force_no_cam_grad=True)
            return out

        return jax.jit(forward, static_argnames=('compute_normals',
                                                 'compute_semantics'))

    def _batch(self, split, idx, field):
        v = getattr(split, field)
        return None if v is None else jnp.asarray(v[idx])

    # ---- The main evaluation --------------------------------------------

    def evaluate(self, state, iteration: int, gen: Generator, writer=None):
        """Full eval pass. Returns current FID (or None if unavailable)."""
        if self._render_fn is None:
            self._render_fn = self._make_render_fn(gen)

        results = {}
        if not self.use_encoder:
            fid_untrunc = self._evaluate_mode(state, iteration, writer,
                                              self.z_fid, None, False)
            results['generation/fid_untrunc'] = fid_untrunc
            current_fid = fid_untrunc
        else:
            fid_front = self._evaluate_mode(state, iteration, writer,
                                            self.z_fid, 'front', False)
            fid_random = self._evaluate_mode(state, iteration, writer,
                                             self.z_fid, 'random', False)
            results['reconstruction/fid_frontview'] = fid_front
            results['reconstruction/fid_randomview'] = fid_random
            current_fid = fid_random
            if (self.test_split is not None and
                    self.dataset_config.get('views_per_object_test')):
                self._evaluate_mode(state, iteration, writer,
                                    self.z_fid_test, 'front', True)
                self._evaluate_mode(state, iteration, writer,
                                    self.z_fid_test, 'random', True)

        if writer is not None:
            for k, v in results.items():
                if v is not None:
                    writer.add_scalar(k, float(v), iteration)

        is_best = current_fid is not None and current_fid < self.best_fid
        if is_best:
            self.best_fid = current_fid
        return current_fid, is_best

    def log_training_images(self, state, iteration: int, gen: Generator,
                            writer, rng: np.random.RandomState):
        """The img/* tensorboard family (run.py:1408-1472): a reference
        batch + an EMA inference render from random training views.

        Uses the EMA generator for the inference images (img/inference*)
        and the current generator for img/rgb (the reference logs the
        G-step's own render; here it is re-rendered — same distribution)."""
        if writer is None:
            return
        if self._render_fn is None:
            self._render_fn = self._make_render_fn(gen)
        cfg = self.cfg
        bs = self.eval_bs
        idx = rng.randint(len(self.train_split.images), size=(bs,))
        pose = self._batch(self.train_split, idx, 'tform_cam2world')
        focal = self._batch(self.train_split, idx, 'focal_length')
        center = self._batch(self.train_split, idx, 'center')
        bbox = self._batch(self.train_split, idx, 'bbox')
        target = self.train_split.images[idx]
        z = jnp.asarray(
            rng.randn(bs, cfg.latent_dim).astype(np.float32))
        image_emb = (jnp.asarray(target[..., :3].transpose(0, 3, 1, 2))
                     if self.use_encoder else None)
        class_label = (jnp.asarray(self.train_split.classes[idx])
                       if self.use_class and
                       self.train_split.classes is not None else None)

        writer.add_images('img/ref',
                          target[..., :3].transpose(0, 3, 1, 2) / 2 + 0.5,
                          iteration)
        for tag, params in (('rgb', state.params_g),
                            ('inference', state.ema_params_g)):
            noise_rng = jax.random.fold_in(jax.random.PRNGKey(4242),
                                           iteration)
            out = self._render_fn(params, z, pose, focal, center, bbox,
                                  image_emb, class_label, noise_rng,
                                  bool(cfg.use_sdf),
                                  bool(cfg.attention_values > 0), None)
            rgb = np.asarray(
                jnp.clip(out.rgb, -1, 1).transpose(0, 3, 1, 2)) / 2 + 0.5
            writer.add_images(f'img/{tag}', rgb, iteration)
            if tag == 'rgb':
                depth = np.asarray(out.depth)
                writer.add_images(
                    'img/depth', (depth / max(depth.max(), 1e-9))[:, None],
                    iteration)
                writer.add_images(
                    'img/mask',
                    np.clip(np.asarray(out.mask), 0, 1)[:, None], iteration)
            if cfg.use_sdf and out.normals is not None:
                writer.add_images(
                    f'img/{"normals" if tag == "rgb" else "inference_normals"}',
                    np.asarray(out.normals.transpose(0, 3, 1, 2)) / 2 + 0.5,
                    iteration)
            if (tag == 'inference' and cfg.attention_values > 0 and
                    out.semantics is not None):
                palette = jnp.asarray(get_color_palette(cfg.attention_values))
                sem = out.semantics @ palette
                writer.add_images('img/inference_semantics',
                                  np.asarray(sem.transpose(0, 3, 1, 2)) / 2 +
                                  0.5, iteration)
        if self.use_encoder:
            writer.add_images('img/inference_ref',
                              target[..., :3].transpose(0, 3, 1, 2) / 2 + 0.5,
                              iteration)

    def _evaluate_mode(self, state, iteration, writer, z_fid, recon_mode,
                       use_testset):
        split = self.test_split if use_testset else self.train_eval_split
        if split is None or z_fid is None:
            return None
        cfg = self.cfg
        target_idx = np.asarray(split.eval_indices)
        target_idx_ = (np.asarray(split.eval_indices_perm)
                       if recon_mode == 'random' else target_idx)

        views_per_object = self.dataset_config.get(
            'views_per_object_test' if use_testset else 'views_per_object')
        compute_recon = recon_mode == 'front' or (
            recon_mode == 'random' and views_per_object is not None and
            views_per_object > 1)

        bs = self.eval_bs
        n = len(target_idx)
        total = {'psnr': 0.0, 'ssim': 0.0, 'lpips': 0.0, 'iou': 0.0}
        activations = []
        for start in range(0, n, bs):
            idx_ = target_idx_[start:start + bs]
            idx0 = target_idx[start:start + bs]
            valid = len(idx_)
            if valid < bs:  # pad straggler; padded rows masked below
                pad_idx = np.repeat(idx_[-1:], bs - valid)
                idx_ = np.concatenate([idx_, pad_idx])
                idx0 = np.concatenate([idx0, np.repeat(idx0[-1:],
                                                       bs - valid)])

            pose = self._batch(split, idx_, 'tform_cam2world')
            focal = self._batch(split, idx_, 'focal_length')
            center = self._batch(split, idx_, 'center')
            bbox = self._batch(split, idx_, 'bbox')
            z = jnp.asarray(z_fid[start:start + bs]) if valid == bs else \
                jnp.asarray(np.concatenate(
                    [z_fid[start:start + valid],
                     np.repeat(z_fid[start + valid - 1:start + valid],
                               bs - valid, 0)]))

            image_emb = None
            if self.use_encoder:
                images_in = (self.test_split.images if use_testset
                             else self.train_split.images)
                image_emb = jnp.asarray(
                    images_in[idx0][..., :3].transpose(0, 3, 1, 2))
            class_label = None
            if self.use_class and split.classes is not None:
                class_label = jnp.asarray(split.classes[idx_])

            first = start == 0
            # fold_in data must fit uint32; iteration 4295+ would
            # overflow the raw product (first real eval is at 5000).
            noise_rng = jax.random.fold_in(
                jax.random.PRNGKey(2424),
                (iteration * 1000003 + start) % (2 ** 32))
            render_rng = (self.render_noise_provider()
                          if self.render_noise_provider is not None
                          else None)
            out = self._render_fn(
                state.ema_params_g, z, pose, focal, center, bbox,
                image_emb, class_label, noise_rng,
                bool(cfg.use_sdf and first),
                bool(cfg.attention_values > 0 and first),
                render_rng)
            if (out.overflow_resid is not None and
                    not getattr(self, '_overflow_warned', False) and
                    int(out.overflow_resid) > 0):
                self._overflow_warned = True
                import warnings
                warnings.warn(
                    f'eval render: {int(out.overflow_resid)} points '
                    'exceeded the windowed sampler overflow capacity — '
                    'metrics are slightly inexact for this camera set; '
                    'raise overflow_capacity_frac '
                    '(models/generator.py).')
            rgb = jnp.clip(out.rgb, -1, 1).transpose(0, 3, 1, 2) / 2 + 0.5

            if compute_recon:
                eval_img = jnp.asarray(
                    split.images[idx_][..., :3].transpose(0, 3, 1, 2)
                ) / 2 + 0.5
                mask_w = np.zeros((bs,), np.float32)
                mask_w[:valid] = 1.0
                mw = jnp.asarray(mask_w)
                total['psnr'] += float(jnp.sum(image_metrics.psnr(
                    rgb, eval_img, reduction='none') * mw))
                total['ssim'] += float(jnp.sum(image_metrics.ssim(
                    rgb, eval_img, reduction='none') * mw))
                if self.lpips_apply is not None:
                    lp = self.lpips_apply(rgb, eval_img).reshape(-1)
                    total['lpips'] += float(jnp.sum(lp * mw))
                if self.dataset_config.get('has_mask'):
                    alpha_real = jnp.asarray(split.images[idx_][..., 3])
                    total['iou'] += float(jnp.sum(image_metrics.iou(
                        out.mask, alpha_real, reduction='none') * mw))

            if first and writer is not None:
                prefix = 'gen' if recon_mode is None else f'recon_{recon_mode}'
                suffix = '_untrunc'
                recon_suffix = '_test' if use_testset else ''
                if recon_mode is not None and compute_recon:
                    writer.add_images(
                        f'img_eval_{prefix}/ref{suffix}{recon_suffix}',
                        np.asarray(eval_img), iteration)
                writer.add_images(
                    f'img_eval_{prefix}/static{suffix}{recon_suffix}',
                    np.asarray(rgb), iteration)
                if cfg.use_sdf and out.normals is not None:
                    writer.add_images(
                        f'img_eval_{prefix}/static_normals{suffix}'
                        f'{recon_suffix}',
                        np.asarray(out.normals.transpose(0, 3, 1, 2)) / 2 +
                        0.5, iteration)
                if cfg.attention_values > 0 and out.semantics is not None:
                    palette = jnp.asarray(
                        get_color_palette(cfg.attention_values))
                    sem = out.semantics @ palette
                    writer.add_images(
                        f'img_eval_{prefix}/static_semantics{suffix}'
                        f'{recon_suffix}',
                        np.asarray(sem.transpose(0, 3, 1, 2)) / 2 + 0.5,
                        iteration)

            if not use_testset and self.inception_apply is not None:
                a = np.asarray(self.inception_apply(rgb))
                activations.append(a[:valid])

        if compute_recon and writer is not None:
            recon_suffix = '_test' if use_testset else ''
            for name in ('psnr', 'ssim', 'lpips', 'iou'):
                if name == 'lpips' and self.lpips_apply is None:
                    continue
                if name == 'iou' and not self.dataset_config.get('has_mask'):
                    continue
                writer.add_scalar(
                    f'reconstruction/{name}{recon_suffix}_{recon_mode}',
                    total[name] / n, iteration)

        if use_testset or self.inception_apply is None:
            return None
        acts = np.concatenate(activations, 0)
        assert len(acts) == n, (len(acts), n)
        stats = fid_lib.calculate_stats(acts)
        real = self.real_stats(self.train_eval_split, 'train')
        if real is None:
            return None
        return float(fid_lib.calculate_frechet_distance(*stats, *real))
