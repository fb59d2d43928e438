"""SDF-pretraining trajectory parity against the REAL reference
(VERDICT r4 missing #1 / next #4, second half).

tests/golden/trajectory_pretrain.npz (scripts/gen_trajectory_golden.py
pretrain) holds a FRESH reference run (no --resume_from, so
pretrain_sdf executes, run.py:821-868): 1000 Adam steps on
(distance MSE to ||x|| - 1) + eikonal over stratified volume samples,
EMA <- params, then 2 normal training iterations. Init weights are
pinned by construction (REF_FORCE_INIT), every RNG draw is substituted
(seed-recorded), and the loop's only scalar telemetry — the
`print('dist', ..., 'eik', ...)` lines every 100 steps — is taped
(REF_TAP_PRINTS).

Replay:
- quick: the first pretrain steps re-run with injected noise; the
  step-0 dist/eik prints pin the pretrain loss math (stratified
  sampling protocol, distance target, eikonal double-backward).
- slow: the FULL 1000-step scan replays; all 10 print pairs must match
  along the trajectory (pinning the Adam chain at lr_g without warmup),
  and the two post-pretrain training iterations must reproduce their
  tensorboard scalars — which transitively pins the complete
  pretrained weight state AND the EMA copy semantics (run.py:866).
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_from_image_tpu.train import gan as gan_lib
from nerf_from_image_tpu.train import pretrain as pretrain_lib
from nerf_from_image_tpu.utils import torch_convert as tc

GOLDEN = (pathlib.Path(__file__).parent / 'golden' /
          'trajectory_pretrain.npz')

pytestmark = pytest.mark.skipif(
    not GOLDEN.exists(),
    reason='pretrain trajectory golden missing; run '
           'scripts/gen_trajectory_golden.py pretrain')


def _regen(entry):
    r = np.random.RandomState(entry['seed'])
    shape = tuple(entry['shape'])
    vals = (r.random_sample(shape) if entry['kind'] == 'rand'
            else r.standard_normal(shape))
    return vals.astype(np.float32)


@pytest.fixture(scope='module')
def tape_data():
    d = np.load(GOLDEN)
    cfg_ref = json.loads(str(d['config_json']))
    tape = json.loads(str(d['tape_json']))
    scalars = json.loads(str(d['scalars_json']))

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
        lr_warmup=True,  # FRESH reference run (run.py:668-676)
        batch_size=cfg_ref['batch_size'],
        use_pallas=False,
        plane_resolution=256,
        channel_base=cfg_ref['channel_base'],
        channel_max=cfg_ref['channel_max'],
    )
    params_g = jax.tree_util.tree_map(
        jnp.asarray, tc.convert_generator(g_sd, attention_values=10,
                                          use_viewdir=False, use_sdf=True))
    params_d = jax.tree_util.tree_map(jnp.asarray,
                                      tc.convert_discriminator(d_sd))
    return d, cfg, tape, scalars, params_g, params_d


def _pretrain_injected(tape, n_steps):
    """Regenerates the first n_steps of per-step pretrain draws: z
    (run.py:828-829) and strata (ops.py:25). The pretrain branch draws
    NO tv/entropy perturbation — only distance+eikonal are requested,
    and the reference's eikonal differentiates at the stratified points
    directly (generator.py:516-538; the perturb randn at :553 belongs
    to tv/entropy only). The tape confirms: 1000 pretrain steps, zero
    generator.py:forward draws among them."""
    zs, strata = [], []
    for e in tape:
        if e['site'] == 'run.py:pretrain_sdf' and e['kind'] == 'randn':
            if len(zs) < n_steps:
                zs.append(_regen(e))
        elif (e['site'] == 'ops.py:sample_volume_stratified' and
              len(strata) < len(zs)):
            strata.append(_regen(e))
        if len(zs) >= n_steps and len(strata) >= n_steps:
            break
    assert len(zs) == len(strata) == n_steps, (len(zs), len(strata))
    return {'z': jnp.asarray(np.stack(zs)),
            'strata': jnp.asarray(np.stack(strata))}


def _print_pairs(tape):
    """(step -> (dist, eik)) from the taped prints; the reference prints
    every 100 steps (run.py:855-862)."""
    out = {}
    step = 0
    for e in tape:
        if e.get('kind') == 'print' and e.get('label') == 'dist':
            out[step * 100] = tuple(e['values'][:2])
            step += 1
    return out


def _make_state(cfg, params_g, params_d):
    opt_g, opt_d = gan_lib.make_optimizers(cfg)
    return gan_lib.GANTrainState(
        params_g=params_g, params_d=params_d,
        ema_params_g=jax.tree_util.tree_map(lambda x: x, params_g),
        opt_g=opt_g.init(params_g), opt_d=opt_d.init(params_d),
        iteration=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0),
        augment_p=jnp.zeros(()), ppl_running_avg=jnp.asarray(-1.0))


def test_pretrain_prefix_matches_reference(tape_data):
    """First pretrain steps with injected noise: the step-0 dist/eik
    console pair pins the stratified-sampling protocol, the
    ||x|| - 1 distance target, and the eikonal double-backward."""
    d, cfg, tape, scalars, params_g, params_d = tape_data
    prints = _print_pairs(tape)
    assert 0 in prints, 'tape carries no step-0 print'
    n = 3
    injected = _pretrain_injected(tape, n)
    state = _make_state(cfg, params_g, params_d)
    _, (dist, eik) = pretrain_lib.pretrain_sdf(
        state, cfg, None, eikonal_weight=cfg.eikonal, lr=cfg.lr_g,
        n_steps=n, injected=injected, return_losses=True)
    np.testing.assert_allclose(float(dist[0]), prints[0][0], rtol=1e-4,
                               err_msg='pretrain dist @ step 0')
    np.testing.assert_allclose(float(eik[0]), prints[0][1], rtol=1e-4,
                               err_msg='pretrain eikonal @ step 0')


@pytest.mark.slow
def test_pretrain_full_trajectory_matches_reference(tape_data):
    """Full 1000-step replay + the two post-pretrain train iterations:
    every 100-step print pair matches along the Adam trajectory, and
    the training scalars afterwards transitively pin the complete
    pretrained weight tree + the EMA copy (run.py:866)."""
    d, cfg, tape, scalars, params_g, params_d = tape_data
    prints = _print_pairs(tape)
    n = pretrain_lib.PRETRAIN_STEPS
    injected = _pretrain_injected(tape, n)
    state = _make_state(cfg, params_g, params_d)
    state, (dist, eik) = pretrain_lib.pretrain_sdf(
        state, cfg, None, eikonal_weight=cfg.eikonal, lr=cfg.lr_g,
        n_steps=n, injected=injected, return_losses=True)

    for step, (dref, eref) in sorted(prints.items()):
        # Accumulated fp divergence grows along 1000 Adam steps; the
        # bands stay proportional to the measured same-RNG residuals
        # (loose late, tight early).
        rtol = 1e-4 if step == 0 else 2e-3
        np.testing.assert_allclose(float(dist[step]), dref, rtol=rtol,
                                   err_msg=f'pretrain dist @ {step}')
        np.testing.assert_allclose(float(eik[step]), eref, rtol=rtol,
                                   err_msg=f'pretrain eik @ {step}')

    # --- the 2 training iterations after pretraining -------------------
    gen, disc = gan_lib.make_models(cfg)
    opt_g, opt_d = gan_lib.make_optimizers(cfg)

    class Reader:
        def __init__(self, entries):
            self.entries = entries
            self.pos = 0

        def take(self, site, kind):
            e = self.entries[self.pos]
            assert e['site'] == site and e['kind'] == kind, \
                (self.pos, e['site'], e['kind'], site, kind)
            self.pos += 1
            return e

    # Post-pretrain tape: everything after the LAST pretrain_sdf z draw.
    last_z = max(i for i, e in enumerate(tape)
                 if e['site'] == 'run.py:pretrain_sdf')
    train_sites = {
        'run.py:sample_batch', 'utils.py:_yield_batch',
        'nerf_utils.py:compute_query_points_from_rays',
        'nerf_utils.py:sample_pdf', 'ops.py:sample_volume_stratified',
        'generator.py:forward',
    }
    # Skip the strata/perturb belonging to the last pretrain step
    # (they precede the first sample_batch draw).
    post = [e for e in tape[last_z + 1:] if e['site'] in train_sites]
    first_train = next(i for i, e in enumerate(post)
                       if e['site'] == 'run.py:sample_batch')
    reader = Reader(post[first_train:])

    images = jnp.asarray(d['images'])
    poses = jnp.asarray(d['poses'])
    bs = cfg.batch_size
    focal = jnp.full((bs,), float(d['focal']))

    def g_batch():
        idx = np.asarray(reader.take('run.py:sample_batch',
                                     'randint')['values'])
        z = jnp.asarray(_regen(reader.take('run.py:sample_batch',
                                           'randn')))
        noise = {
            'depth': jnp.asarray(_regen(reader.take(
                'nerf_utils.py:compute_query_points_from_rays', 'rand'))),
            'strata': jnp.asarray(_regen(reader.take(
                'ops.py:sample_volume_stratified', 'rand'))),
            'perturb': jnp.asarray(_regen(reader.take(
                'generator.py:forward', 'randn'))),
            'pdf_u': jnp.asarray(_regen(reader.take(
                'nerf_utils.py:sample_pdf', 'rand'))),
        }
        return {'pose': poses[idx], 'focal': focal, 'z': z, 'noise': noise}

    g_jit = jax.jit(
        lambda s, b: gan_lib.g_step(s, b, gen, disc, opt_g, cfg))
    d_jit = jax.jit(
        lambda s, b, f: gan_lib.d_step(s, b, f, gen, disc, opt_d, cfg,
                                       use_r1_now=True, blur_active=True))

    def ref(tag, step):
        for s, v in scalars[tag]:
            if s == step:
                return v
        raise KeyError((tag, step))

    state, mg0 = g_jit(state, g_batch())
    np.testing.assert_allclose(float(mg0['loss_g']), ref('loss/g', 0),
                               rtol=2e-3, err_msg='post-pretrain loss/g@0')
    np.testing.assert_allclose(float(mg0['loss_eikonal']),
                               ref('loss/eikonal', 0), rtol=2e-3,
                               err_msg='post-pretrain loss/eikonal@0')

    perm = np.asarray(reader.take('utils.py:_yield_batch',
                                  'permutation')['values'])
    reader.take('run.py:sample_batch', 'randn')  # unused real-phase z
    real_batch = {'pose': poses[perm[:bs]], 'focal': focal,
                  'image': images[perm[:bs]]}
    fake_idx = np.asarray(reader.take('run.py:sample_batch',
                                      'randint')['values'])
    fake_z = jnp.asarray(_regen(reader.take('run.py:sample_batch',
                                            'randn')))
    fake_noise = {
        'depth': jnp.asarray(_regen(reader.take(
            'nerf_utils.py:compute_query_points_from_rays', 'rand'))),
        'pdf_u': jnp.asarray(_regen(reader.take(
            'nerf_utils.py:sample_pdf', 'rand'))),
    }
    fake_batch = {'pose': poses[fake_idx], 'focal': focal, 'z': fake_z,
                  'noise': fake_noise}
    state, md1 = d_jit(state, real_batch, fake_batch)
    np.testing.assert_allclose(float(md1['loss_d_real']),
                               ref('loss/d_real', 1), rtol=2e-3,
                               err_msg='post-pretrain loss/d_real@1')
    np.testing.assert_allclose(float(md1['loss_d_fake']),
                               ref('loss/d_fake', 1), rtol=2e-3,
                               err_msg='post-pretrain loss/d_fake@1')
