"""GAN `evaluate()` trajectory parity against the REAL reference
(VERDICT r4 missing #1 / next #4).

tests/golden/trajectory_gan_eval.npz (scripts/gen_trajectory_golden.py
eval mode) holds a 4-iteration encoder-mode run of /root/reference/run.py
on CPU — G, D(R1), G, D(R1) — that hits the reference's i == 3 smoke
eval (run.py:1195-1197): evaluate(front) + evaluate(random) over the
seeded eval indices / view permutation (run.py:416-499), frozen real
Inception stats (run.py:385-403), recon PSNR/SSIM/LPIPS (run.py:
1272-1296), FID Fréchet distances, and the best_fid bookkeeping
(run.py:1403-1405).

The replay drives the rebuild's GANEvaluator end-to-end with the exact
same inputs: converted init weights, the recorded training batches, the
recorded eval view permutation + frozen z latents, the taped per-render
noise (injected via render_noise_provider), the seeded stub Inception
extractor, and the seeded stub LPIPS weights. Matching the five
reconstruction/* scalars proves the whole eval pipeline — eval-index
protocol, EMA rendering, metric accumulation (batch-sum / n), activation
collection order, stats + Fréchet math, and fid_randomview best-gating —
is reference-equivalent after four real optimizer steps.
"""

import importlib.util
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Heavy reference-replay family (the evaluate() smoke-eval replay):
# the module fixture compiles multiple full jitted programs, so the
# whole module lives in the parity lane (pytest -m parity, REQUIRED
# in CI) and outside the quick inner loop ('not slow').
pytestmark = [pytest.mark.parity, pytest.mark.slow]

from nerf_from_image_tpu.data.loaders import DatasetSplit
from nerf_from_image_tpu.models.lpips import LPIPS
from nerf_from_image_tpu.train import eval as eval_lib
from nerf_from_image_tpu.train import gan as gan_lib
from nerf_from_image_tpu.utils import torch_convert as tc

REPO = pathlib.Path(__file__).parent.parent
GOLDEN = pathlib.Path(__file__).parent / 'golden' / 'trajectory_gan_eval.npz'

CARLA_DATASET_CONFIG = {
    'scene_range': 3.0,
    'white_background': True,
    'has_mask': False,
    'has_bbox': False,
    'is_highres': True,
    'views_per_object': 1,
    'views_per_object_test': None,
    'camera_projection_model': 'perspective',
    'camera_flipped': False,
}


def _regen(entry):
    r = np.random.RandomState(entry['seed'])
    shape = tuple(entry['shape'])
    vals = (r.random_sample(shape) if entry['kind'] == 'rand'
            else r.standard_normal(shape))
    return jnp.asarray(vals.astype(np.float32))


class _TapeReader:
    def __init__(self, tape):
        keep_sites = {
            'run.py:compute_view_perm',
            'run.py:<module>',
            'run.py:sample_batch',
            'nerf_utils.py:compute_query_points_from_rays',
            'nerf_utils.py:sample_pdf',
            'ops.py:sample_volume_stratified',
            'generator.py:forward',
            'utils.py:_yield_batch',
        }
        self.entries = [e for e in tape if e['site'] in keep_sites]
        self.pos = 0

    def take(self, site, kind):
        e = self.entries[self.pos]
        assert e['site'] == site and e['kind'] == kind, \
            f'tape mismatch at {self.pos}: got {e["site"]}/{e["kind"]}, ' \
            f'wanted {site}/{kind}'
        self.pos += 1
        return e


def _stub_inception_apply():
    """Rebuilds scripts/ref_stubs/pytorch_fid's seeded deterministic
    extractor (torch.Generator(4242): conv 3->32 k3 s4, relu, global
    mean, linear 32->2048) as a jitted jax fn. Both sides of the
    trajectory use the exact same tensors."""
    spec = importlib.util.spec_from_file_location(
        'ref_fid_stub', REPO / 'scripts' / 'ref_stubs' / 'pytorch_fid' /
        'inception.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    stub = mod.InceptionV3()
    conv_w = jnp.asarray(stub.conv.weight.detach().numpy())
    lin_w = jnp.asarray(stub.lin.weight.detach().numpy())

    @jax.jit
    def apply(im):  # (N, 3, H, W) in [0, 1]
        x = jax.lax.conv_general_dilated(
            im.astype(jnp.float32), conv_w, (4, 4), 'VALID',
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
        h = jnp.maximum(x, 0.0).mean(axis=(2, 3))
        return h @ lin_w.T

    return apply


def _stub_lpips_apply():
    """Seeded stub LPIPS weights (torch.Generator(7771)) -> flax LPIPS,
    wrapped with the reference call convention (normalize=True on [0,1]
    inputs, lib/metrics.py:111-117)."""
    spec = importlib.util.spec_from_file_location(
        'ref_lpips_stub', REPO / 'scripts' / 'ref_stubs' / 'lpips' /
        '__init__.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    stub = mod.LPIPS(net='vgg')
    sd = {k: v.numpy() for k, v in stub.state_dict().items()}
    vgg_sd = {k[len('net.'):]: v for k, v in sd.items()
              if k.startswith('net.features')}
    lin_sd = {f'lins.{i}.model.1.weight': sd[f'lins.{i}.weight']
              for i in range(5)}
    variables = jax.tree_util.tree_map(jnp.asarray,
                                       tc.convert_lpips(vgg_sd, lin_sd))
    model = LPIPS()

    @jax.jit
    def apply(a, b):
        return model.apply(variables, a, b, normalize=True)

    return apply


def _tap_images(entry):
    arr = entry['arrays']['images']
    return np.asarray(arr['values'], np.float32).reshape(arr['shape'])


class _RecordingWriter:
    def __init__(self):
        self.scalars = {}

    def add_scalar(self, tag, value, step):
        self.scalars[(tag, step)] = float(value)

    def add_images(self, *a, **kw):
        pass


@pytest.fixture(scope='module')
def eval_trajectory():
    assert GOLDEN.exists(), \
        'eval trajectory golden missing; run ' \
        'scripts/gen_trajectory_golden.py eval'
    d = np.load(GOLDEN)
    cfg_ref = json.loads(str(d['config_json']))
    tape = json.loads(str(d['tape_json']))
    scalars = json.loads(str(d['scalars_json']))
    train_images = _tap_images(
        next(e for e in tape if e['site'] == 'tap:train_split'))
    eval_images = _tap_images(
        next(e for e in tape if e['site'] == 'tap:train_eval_split'))

    g_sd = {k[len('init_g/'):]: d[k] for k in d.files
            if k.startswith('init_g/')}
    d_sd = {k[len('init_d/'):]: d[k] for k in d.files
            if k.startswith('init_d/')}

    cfg = gan_lib.GANConfig(
        resolution=cfg_ref['resolution'],
        latent_dim=cfg_ref['latent_dim'],
        depth_samples_per_ray=64,
        fine_sampling=True,
        scene_range=cfg_ref['scene_range'],
        white_background=cfg_ref['white_background'],
        camera_flipped=False,
        supervise_alpha=False,
        conditional_pose=True,
        use_sdf=True,
        use_encoder=True,
        attention_values=10,
        tv=cfg_ref['tv'],
        entropy=cfg_ref['entropy'],
        eikonal=cfg_ref['eikonal'],
        r1=cfg_ref['r1'],
        path_length_regularization=False,
        augment_p_max=0.0,
        clip_gradient_norm=100.0,
        lr_g=cfg_ref['lr_g'],
        lr_d=cfg_ref['lr_d'],
        lr_warmup=False,
        batch_size=cfg_ref['batch_size'],
        use_pallas=False,
        plane_resolution=256,
        channel_base=cfg_ref['channel_base'],
        channel_max=cfg_ref['channel_max'],
    )

    params_g = tc.convert_generator(g_sd, attention_values=10,
                                    use_viewdir=False, use_sdf=True)
    params_d = tc.convert_discriminator(d_sd)
    gen, disc = gan_lib.make_models(cfg)
    opt_g, opt_d = gan_lib.make_optimizers(cfg)

    params_g = jax.tree_util.tree_map(jnp.asarray, params_g)
    params_d = jax.tree_util.tree_map(jnp.asarray, params_d)
    state = gan_lib.GANTrainState(
        params_g=params_g,
        params_d=params_d,
        ema_params_g=jax.tree_util.tree_map(lambda x: x, params_g),
        opt_g=opt_g.init(params_g),
        opt_d=opt_d.init(params_d),
        iteration=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(0),
        augment_p=jnp.zeros(()),
        ppl_running_avg=jnp.asarray(-1.0),
    )

    bs = cfg_ref['batch_size']
    images = jnp.asarray(train_images)
    poses = jnp.asarray(d['poses'])
    focal = jnp.full((bs,), float(d['focal']))

    reader = _TapeReader(tape)
    results = {}

    # Pre-training protocol draws: the eval view permutation
    # (run.py:441-476, views_per_object == 1 -> a plain randperm of the
    # arange eval indices) and the frozen z_fid_untrunc latents
    # (run.py:491-493).
    view_perm = np.asarray(
        reader.take('run.py:compute_view_perm', 'permutation')['values'])
    z_fid = np.asarray(_regen(reader.take('run.py:<module>', 'randn')))

    def g_batch():
        idx = np.asarray(reader.take('run.py:sample_batch',
                                     'randint')['values'])
        z = _regen(reader.take('run.py:sample_batch', 'randn'))
        noise = {
            'depth': _regen(reader.take(
                'nerf_utils.py:compute_query_points_from_rays', 'rand')),
            'strata': _regen(reader.take(
                'ops.py:sample_volume_stratified', 'rand')),
            'perturb': _regen(reader.take('generator.py:forward', 'randn')),
            'pdf_u': _regen(reader.take('nerf_utils.py:sample_pdf', 'rand')),
        }
        return {'pose': poses[idx], 'focal': focal, 'z': z,
                'image': images[idx], 'noise': noise}

    def d_batches(real_idx):
        reader.take('run.py:sample_batch', 'randn')  # unused real-phase z
        real_batch = {'pose': poses[real_idx], 'focal': focal,
                      'image': images[real_idx]}
        fake_idx = np.asarray(reader.take('run.py:sample_batch',
                                          'randint')['values'])
        fake_z = _regen(reader.take('run.py:sample_batch', 'randn'))
        fake_noise = {
            'depth': _regen(reader.take(
                'nerf_utils.py:compute_query_points_from_rays', 'rand')),
            'pdf_u': _regen(reader.take('nerf_utils.py:sample_pdf', 'rand')),
        }
        fake_batch = {'pose': poses[fake_idx], 'focal': focal, 'z': fake_z,
                      'image': images[fake_idx], 'noise': fake_noise}
        return real_batch, fake_batch

    g_jit = jax.jit(
        lambda s, b: gan_lib.g_step(s, b, gen, disc, opt_g, cfg))
    d_jit = jax.jit(
        lambda s, b, f: gan_lib.d_step(s, b, f, gen, disc, opt_d, cfg,
                                       use_r1_now=True, blur_active=True))

    # --- i = 0: G step ----------------------------------------------------
    state, mg0 = g_jit(state, g_batch())
    results[0] = {k: float(v) for k, v in mg0.items()}

    # --- i = 1: D step (R1: i % 2 == 1) -----------------------------------
    perm = np.asarray(reader.take('utils.py:_yield_batch',
                                  'permutation')['values'])
    real_batch, fake_batch = d_batches(perm[:bs])
    state, md1 = d_jit(state, real_batch, fake_batch)
    results[1] = {k: float(v) for k, v in md1.items()}

    # --- i = 2: G step ----------------------------------------------------
    state, mg2 = g_jit(state, g_batch())
    results[2] = {k: float(v) for k, v in mg2.items()}

    # --- i = 3: D step (second half of the epoch permutation) -------------
    real_batch, fake_batch = d_batches(perm[bs:2 * bs])
    state, md3 = d_jit(state, real_batch, fake_batch)
    results[3] = {k: float(v) for k, v in md3.items()}

    # --- i == 3 smoke eval (run.py:1195-1197) ------------------------------
    train_split = DatasetSplit(
        images=train_images, tform_cam2world=np.asarray(d['poses']),
        focal_length=np.full((len(train_images),), float(d['focal']),
                             np.float32))
    train_eval_split = DatasetSplit(
        images=eval_images, tform_cam2world=np.asarray(d['poses']),
        focal_length=np.full((len(eval_images),), float(d['focal']),
                             np.float32))

    evaluator = eval_lib.GANEvaluator(
        cfg, CARLA_DATASET_CONFIG, 'carla', train_split, train_eval_split,
        inception_apply=_stub_inception_apply(),
        lpips_apply=_stub_lpips_apply(),
        use_encoder=True, eval_batch_size=bs, seed=1234)
    # Replay the reference's generator-seeded protocol draws verbatim:
    # the torch.Generator(1234) randperm + randn the numpy-side seeding
    # cannot reproduce.
    assert np.array_equal(np.asarray(train_eval_split.eval_indices),
                          np.arange(len(eval_images)))
    train_eval_split.eval_indices_perm = \
        np.asarray(train_eval_split.eval_indices)[view_perm]
    evaluator.z_fid = z_fid.astype(np.float32)

    render_noise = []
    for _ in range(4):  # front x2 batches, random x2 batches
        render_noise.append({
            'depth': _regen(reader.take(
                'nerf_utils.py:compute_query_points_from_rays', 'rand')),
            'pdf_u': _regen(reader.take('nerf_utils.py:sample_pdf', 'rand')),
        })
    noise_iter = iter(render_noise)
    evaluator.render_noise_provider = lambda: next(noise_iter)

    writer = _RecordingWriter()
    current_fid, is_best = evaluator.evaluate(state, 3, gen, writer)
    eval_out = dict(writer.scalars)
    eval_out[('reconstruction/fid_randomview_return', 3)] = current_fid
    eval_out[('is_best', 3)] = is_best
    eval_out[('best_fid', 3)] = evaluator.best_fid

    # Drain the tape draws belonging to the img/* logging block the
    # replay intentionally skips (no asserted scalar depends on it:
    # run.py:1428-1459 renders one EMA inference batch for tensorboard).
    reader.take('run.py:<module>', 'randn')  # img-log z
    reader.take('nerf_utils.py:compute_query_points_from_rays', 'rand')
    reader.take('nerf_utils.py:sample_pdf', 'rand')
    assert reader.pos == len(reader.entries), 'unconsumed tape entries'
    assert next(noise_iter, None) is None, 'unconsumed eval render noise'

    return results, eval_out, scalars


def _ref(scalars, tag, step):
    for s, v in scalars[tag]:
        if s == step:
            return v
    raise KeyError(f'{tag} @ {step}')


@pytest.mark.parametrize('step,key,tag', [
    (0, 'loss_g', 'loss/g'),
    (0, 'loss_eikonal', 'loss/eikonal'),
    (0, 'grad_norm_g', 'grad_norm/g'),
    (1, 'loss_d_real', 'loss/d_real'),
    (1, 'loss_d_fake', 'loss/d_fake'),
    (1, 'loss_r1', 'loss/r1'),
    (1, 'grad_norm_d', 'grad_norm/d'),
    (2, 'loss_g', 'loss/g'),
    (2, 'loss_eikonal', 'loss/eikonal'),
    (2, 'grad_norm_g', 'grad_norm/g'),
    (3, 'loss_d_real', 'loss/d_real'),
    (3, 'loss_d_fake', 'loss/d_fake'),
    (3, 'loss_r1', 'loss/r1'),
    (3, 'grad_norm_d', 'grad_norm/d'),
])
def test_train_scalar_matches_reference(eval_trajectory, step, key, tag):
    """The four encoder-mode training iterations leading into the eval
    replay scalar-for-scalar (this also covers the image-conditional
    G/D batch paths the plain trajectory tape does not exercise)."""
    results, _, scalars = eval_trajectory
    # grad_norm aggregates every parameter gradient — including the
    # ResidualEncoder's instance-norm chains, whose tiny gradients lose
    # relative precision fastest — so its band after two optimizer steps
    # is pinned above the measured same-RNG residual (7.3e-4 @ step 2)
    # rather than the 1e-4 the losses hold to.
    rtol = 2e-3 if (step >= 2 and key.startswith('grad_norm')) else 1e-4
    np.testing.assert_allclose(results[step][key], _ref(scalars, tag, step),
                               rtol=rtol, atol=2e-6,
                               err_msg=f'{tag} @ step {step}')


@pytest.mark.parametrize('tag', [
    'reconstruction/psnr_front',
    'reconstruction/ssim_front',
    'reconstruction/lpips_front',
])
def test_recon_metric_matches_reference(eval_trajectory, tag):
    """Recon metrics over the seeded eval indices: batch-sum / n
    accumulation through the EMA render (run.py:1272-1296)."""
    _, eval_out, scalars = eval_trajectory
    got = eval_out[(tag, 3)]
    np.testing.assert_allclose(got, _ref(scalars, tag, 3), rtol=1e-4,
                               atol=2e-6, err_msg=tag)


@pytest.mark.parametrize('tag', [
    'reconstruction/fid_frontview',
    'reconstruction/fid_randomview',
])
def test_fid_matches_reference(eval_trajectory, tag):
    """FID vs the frozen real stats: activation collection order, stats,
    and the scipy-sqrtm Fréchet distance (run.py:1371-1390,
    lib/fid.py:41-68). Slightly wider band: the 2048-D covariance sqrtm
    from 8 samples is rank-deficient, so fp accumulation differences are
    amplified through the eigenspectrum."""
    _, eval_out, scalars = eval_trajectory
    got = eval_out[(tag, 3)]
    np.testing.assert_allclose(got, _ref(scalars, tag, 3), rtol=2e-3,
                               err_msg=tag)


def test_best_fid_gating(eval_trajectory):
    """current_fid = fid_randomview in encoder mode (run.py:1398-1400),
    and the first eval always sets best_fid -> checkpoint_best
    (run.py:1403-1405, 1511-1513)."""
    _, eval_out, scalars = eval_trajectory
    ref_random = _ref(scalars, 'reconstruction/fid_randomview', 3)
    np.testing.assert_allclose(
        eval_out[('reconstruction/fid_randomview_return', 3)], ref_random,
        rtol=2e-3)
    assert eval_out[('is_best', 3)] is True
    np.testing.assert_allclose(eval_out[('best_fid', 3)], ref_random,
                               rtol=2e-3)
