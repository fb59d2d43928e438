import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.core import rays, compositing, sampling


def _close(a, b, tol=1e-5):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol, atol=tol)


def test_ray_bundle_perspective(golden):
    o, d = rays.get_ray_bundle(8, 9, jnp.asarray(golden['focal']),
                               jnp.asarray(golden['pose_persp']))
    _close(o, golden['persp_plain_o'])
    _close(d, golden['persp_plain_d'])


def test_ray_bundle_perspective_bbox_center(golden):
    o, d = rays.get_ray_bundle(8, 9, jnp.asarray(golden['focal']),
                               jnp.asarray(golden['pose_persp']),
                               jnp.asarray(golden['bbox']),
                               jnp.asarray(golden['center']))
    _close(o, golden['persp_bbox_o'])
    _close(d, golden['persp_bbox_d'])


def test_ray_bundle_ortho(golden):
    o, d = rays.get_ray_bundle(8, 9, None, jnp.asarray(golden['pose_ortho']))
    _close(o, golden['ortho_plain_o'])
    _close(d, golden['ortho_plain_d'])


def test_ray_bundle_ortho_bbox(golden):
    o, d = rays.get_ray_bundle(8, 9, None, jnp.asarray(golden['pose_ortho']),
                               jnp.asarray(golden['bbox']))
    _close(o, golden['ortho_bbox_o'])
    _close(d, golden['ortho_bbox_d'])


def test_near_far(golden):
    near, far = rays.compute_near_far_planes(
        jnp.asarray(golden['nf_o']), jnp.asarray(golden['nf_d']), 0.55)
    _close(near, golden['nf_near'])
    _close(far, golden['nf_far'])


def test_query_points(golden):
    qp, dv = rays.compute_query_points_from_rays(
        jnp.asarray(golden['nf_o']), jnp.asarray(golden['nf_d']),
        jnp.asarray(golden['nf_near']), jnp.asarray(golden['nf_far']), 16,
        rng=None)
    _close(qp, golden['qp_points'])
    _close(dv, golden['qp_depths'])


def test_compositing(golden):
    rgb_m, depth_m, mask_m, norm_m, sem_m = compositing.render_volume_density(
        jnp.asarray(golden['comp_sigma']), jnp.asarray(golden['comp_rgb']),
        jnp.asarray(golden['nf_d']), jnp.asarray(golden['qp_depths']),
        jnp.asarray(golden['comp_normals']), jnp.asarray(golden['comp_sem']),
        white_background=True)
    _close(rgb_m, golden['comp_rgb_map'], 1e-4)
    _close(depth_m, golden['comp_depth_map'], 1e-4)
    _close(mask_m, golden['comp_mask'], 1e-4)
    _close(norm_m, golden['comp_normal_map'], 1e-4)
    _close(sem_m, golden['comp_sem_map'], 1e-4)


def test_weights_only(golden):
    w = compositing.render_volume_density_weights_only(
        jnp.asarray(golden['comp_sigma']), jnp.asarray(golden['nf_d']),
        jnp.asarray(golden['qp_depths']))
    _close(w, golden['comp_weights'], 1e-4)


def test_sample_pdf(golden):
    s = sampling.sample_pdf(jnp.asarray(golden['pdf_bins']),
                            jnp.asarray(golden['pdf_weights']), 24, rng=None)
    _close(s, golden['pdf_samples'], 1e-4)


def test_smooth_weights(golden):
    out = sampling.smooth_weights_eg3d(jnp.asarray(golden['smooth_weights_in']))
    _close(out, golden['smooth_weights_out'], 1e-5)


def test_compute_weights_unsorted_matches_sorted():
    """Pairwise-mask merged weights == sort + exclusive-cumprod weights."""
    import jax
    k = jax.random.PRNGKey(7)
    r, s = 13, 24
    z1 = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (r, s)),
                  axis=-1) * 2 + 1
    z2 = jax.random.uniform(jax.random.PRNGKey(2), (r, s)) * 2 + 1
    z_cat = jnp.concatenate((z1, z2), axis=-1)
    sigma = jax.random.uniform(jax.random.PRNGKey(3), (r, 2 * s)) * 5
    rd = jax.random.normal(k, (r, 3))

    w_unsorted = compositing.compute_weights_unsorted(sigma, rd, z_cat)

    order = jnp.argsort(z_cat, axis=-1)
    w_sorted = compositing.compute_weights(
        jnp.take_along_axis(sigma, order, axis=-1), rd,
        jnp.take_along_axis(z_cat, order, axis=-1))
    _close(jnp.take_along_axis(w_unsorted, order, axis=-1), w_sorted, 1e-5)
