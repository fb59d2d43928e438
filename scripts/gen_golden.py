"""Generates golden parity fixtures from the reference implementation.

Run once (requires the read-only reference checkout); writes small .npz
files into tests/golden/. Tests only consume the .npz — the reference code
is never imported at test time and never shipped.

Usage: python scripts/gen_golden.py [--reference /root/reference]
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
    from lib import nerf_utils  # noqa: E402
    from lib import pose_utils  # noqa: E402
    from lib import ops  # noqa: E402

    # numpy 2 rejects np.array(..., copy=False) on tensors; shim it for the
    # reference's matrix_to_quaternion.
    _np_array = np.array

    def _array_compat(obj, *a, **kw):
        if kw.get('copy', None) is False:
            kw.pop('copy')
            return np.asarray(obj, *a, **kw)
        return _np_array(obj, *a, **kw)

    np.array = _array_compat

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    os.makedirs(args.out, exist_ok=True)

    def t(x):
        return torch.from_numpy(np.ascontiguousarray(x)).float()

    out = {}

    # --- Ray bundles -------------------------------------------------------
    b, h, w = 3, 8, 9
    # Random valid cam2world: rotation + translation at distance ~4.
    def random_pose(n, scale=None):
        mats = []
        for _ in range(n):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            w0, x, y, z = q
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w0), 2 * (x * z + y * w0)],
                [2 * (x * y + z * w0), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w0)],
                [2 * (x * z - y * w0), 2 * (y * z + x * w0), 1 - 2 * (x * x + y * y)],
            ])
            m = np.eye(4)
            m[:3, :3] = R
            m[:3, 3] = R @ np.array([0.1, -0.2, 4.0])
            if scale is not None:
                m[3, 3] = scale
            mats.append(m)
        return np.stack(mats).astype(np.float32)

    pose_persp = random_pose(b)
    focal = (rng.rand(b).astype(np.float32) * 2 + 1.0)
    bbox = np.stack([
        rng.rand(b, 2).astype(np.float32) * 0.2 - 0.1,
        rng.rand(b, 2).astype(np.float32) * 0.5 + 0.7,
    ], axis=1)  # (B, 2, 2)
    center = rng.rand(b, 2).astype(np.float32) * 0.2 + 0.4

    ro, rd = nerf_utils.get_ray_bundle(h, w, t(focal), t(pose_persp), None, None)
    out['persp_plain_o'], out['persp_plain_d'] = ro.numpy(), rd.numpy()

    ro, rd = nerf_utils.get_ray_bundle(h, w, t(focal), t(pose_persp), t(bbox),
                                       t(center))
    out['persp_bbox_o'], out['persp_bbox_d'] = ro.numpy(), rd.numpy()

    pose_ortho = random_pose(b, scale=0.7)
    ro, rd = nerf_utils.get_ray_bundle(h, w, None, t(pose_ortho), None, None)
    out['ortho_plain_o'], out['ortho_plain_d'] = ro.numpy(), rd.numpy()
    ro, rd = nerf_utils.get_ray_bundle(h, w, None, t(pose_ortho), t(bbox), None)
    out['ortho_bbox_o'], out['ortho_bbox_d'] = ro.numpy(), rd.numpy()

    out['pose_persp'] = pose_persp
    out['pose_ortho'] = pose_ortho
    out['focal'] = focal
    out['bbox'] = bbox
    out['center'] = center

    # --- Near/far ----------------------------------------------------------
    ro = t(out['persp_plain_o'])
    rd = torch.nn.functional.normalize(t(out['persp_plain_d']), dim=-1)
    near, far = nerf_utils.compute_near_far_planes(ro, rd, 0.55)
    out['nf_o'] = ro.numpy()
    out['nf_d'] = rd.numpy()
    out['nf_near'] = near.numpy()
    out['nf_far'] = far.numpy()

    # --- Query points (deterministic) ---------------------------------------
    qp, dv = nerf_utils.compute_query_points_from_rays(
        ro, rd, near, far, 16, randomize=False)
    out['qp_points'] = qp.numpy()
    out['qp_depths'] = dv.numpy()

    # --- Compositing ---------------------------------------------------------
    sigma = np.abs(rng.randn(b, h, w, 16)).astype(np.float32) * 3
    rgb = rng.randn(b, h, w, 16, 3).astype(np.float32)
    normals = rng.randn(b, h, w, 16, 3).astype(np.float32)
    sem = rng.rand(b, h, w, 16, 5).astype(np.float32)
    rgb_m, depth_m, mask_m, norm_m, sem_m = nerf_utils.render_volume_density(
        t(sigma), t(rgb), ro, rd, dv, t(normals), t(sem),
        white_background=True)
    out['comp_sigma'] = sigma
    out['comp_rgb'] = rgb
    out['comp_normals'] = normals
    out['comp_sem'] = sem
    out['comp_rgb_map'] = rgb_m.numpy()
    out['comp_depth_map'] = depth_m.numpy()
    out['comp_mask'] = mask_m.numpy()
    out['comp_normal_map'] = norm_m.numpy()
    out['comp_sem_map'] = sem_m.numpy()
    wts = nerf_utils.render_volume_density_weights_only(t(sigma), ro, rd, dv)
    out['comp_weights'] = wts.numpy()

    # --- sample_pdf (deterministic) ------------------------------------------
    bins = np.sort(rng.rand(6, 15).astype(np.float32) * 4 + 1, axis=-1)
    weights = np.abs(rng.randn(6, 14)).astype(np.float32)
    samples = nerf_utils.sample_pdf(t(bins), t(weights), 24, deterministic=True)
    out['pdf_bins'] = bins
    out['pdf_weights'] = weights
    out['pdf_samples'] = samples.numpy()

    # --- Weight smoothing (EG3D max/avg pool) --------------------------------
    wsm = torch.nn.functional.max_pool1d(
        t(out['comp_weights'].reshape(-1, 16)).unsqueeze(1), 2, 1, padding=1)
    wsm = torch.nn.functional.avg_pool1d(wsm, 2, 1).squeeze(1) + 0.01
    out['smooth_weights_in'] = out['comp_weights'].reshape(-1, 16)
    out['smooth_weights_out'] = wsm.numpy()

    # --- Pose math ------------------------------------------------------------
    out['inv_persp'] = pose_utils.invert_space(t(pose_persp)).numpy()
    out['inv_ortho'] = pose_utils.invert_space(t(pose_ortho)).numpy()

    q = rng.randn(5, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    out['quat'] = q
    out['quat_mat'] = pose_utils.quaternion_to_matrix(t(q)).numpy()

    z0 = rng.randn(5).astype(np.float32) * 0.3
    t2 = rng.randn(5, 2).astype(np.float32) * 0.2
    s = (rng.rand(5).astype(np.float32) + 0.5)
    for flipped in (False, True):
        sfx = '_flip' if flipped else ''
        mat, f = pose_utils.pose_to_matrix(t(z0), t(t2), t(s), t(q), flipped)
        out[f'p2m_mat{sfx}'] = mat.numpy()
        out[f'p2m_f{sfx}'] = f.numpy()
        mat_o, f_o = pose_utils.pose_to_matrix(None, t(t2), t(s), t(q), flipped)
        out[f'p2m_mat_ortho{sfx}'] = mat_o.numpy()
        # Round trip back.
        z0b, t2b, sb, qb = pose_utils.matrix_to_pose(mat, f, flipped)
        out[f'm2p_z0{sfx}'] = z0b.numpy()
        out[f'm2p_t2{sfx}'] = t2b.numpy()
        out[f'm2p_s{sfx}'] = sb.numpy()
        out[f'm2p_q{sfx}'] = qb.numpy()
        cond = pose_utils.matrix_to_conditioning_vector(t(pose_persp), t(focal),
                                                        flipped)
        out[f'cond_vec{sfx}'] = cond.numpy()
    out['p2m_z0'] = z0
    out['p2m_t2'] = t2
    out['p2m_s'] = s

    rotd = pose_utils.rotation_matrix_distance(t(pose_persp), t(random_pose(b)))
    out['rotd_other'] = np.stack([m for m in random_pose(b)])
    # regenerate deterministically: use same call sequence is tricky; store inputs
    other = random_pose(b)
    out['rotd_other'] = other
    out['rotd'] = pose_utils.rotation_matrix_distance(t(pose_persp),
                                                      t(other)).numpy()

    # --- grid_sample2d ----------------------------------------------------------
    img = rng.randn(2, 7, 9, 11).astype(np.float32)
    grid = (rng.rand(2, 5, 6, 2).astype(np.float32) * 2.4 - 1.2)  # incl. border
    out['gs_img'] = img
    out['gs_grid'] = grid
    out['gs_out'] = ops.grid_sample2d(t(img), t(grid)).numpy()

    # --- blur ----------------------------------------------------------------
    im = rng.randn(2, 3, 16, 16).astype(np.float32)
    out['blur_in'] = im
    out['blur_out_i100'] = ops.blur(t(im), 100, 12500, True).numpy()
    out['blur_out_i12000'] = ops.blur(t(im), 12000, 12500, False).numpy()

    # --- modulated conv + equalized layers (models/stylegan.py) ---------------
    sys.path.insert(0, args.reference)
    from models import stylegan  # noqa: E402
    x = rng.randn(2, 8, 16, 16).astype(np.float32)
    wconv = rng.randn(12, 8, 3, 3).astype(np.float32)
    styles = rng.randn(2, 8).astype(np.float32)
    out['mc_x'], out['mc_w'], out['mc_styles'] = x, wconv, styles
    out['mc_plain'] = stylegan.conv_modulated2d(
        t(x), t(wconv), t(styles), padding=1,
        resample_filter=stylegan.bilinear_filter()).numpy()
    out['mc_up'] = stylegan.conv_modulated2d(
        t(x), t(wconv).transpose(0, 1).contiguous().transpose(0, 1), t(styles),
        up=True, padding=1,
        resample_filter=stylegan.bilinear_filter()).numpy()
    out['mc_nodemod'] = stylegan.conv_modulated2d(
        t(x), t(wconv), t(styles), padding=1, demodulate=False,
        resample_filter=stylegan.bilinear_filter()).numpy()

    out['us_in'] = x
    out['us_out'] = stylegan.upsample2d(t(x), stylegan.bilinear_filter()).numpy()
    out['ds_out'] = stylegan.downsample2d(t(x), stylegan.bilinear_filter()).numpy()
    out['f2d_out'] = stylegan.filter2d(t(x), stylegan.bilinear_filter()).numpy()
    out['f2d_t_out'] = stylegan.filter2d(t(x), stylegan.bilinear_filter(),
                                         transpose=True).numpy()

    # laplace / sigmoid helpers
    from models import generator as ref_gen  # noqa: E402
    xs = rng.randn(4, 17).astype(np.float32)
    beta = np.float32(0.17)
    out['lap_x'] = xs
    out['lap_pdf'] = ref_gen.laplace_pdf(t(xs), torch.tensor(beta)).numpy()
    out['lap_cdf'] = ref_gen.laplace_cdf(t(xs), torch.tensor(beta)).numpy()
    out['wsig'] = ref_gen.wide_sigmoid_rescaled(t(xs)).numpy()

    np.savez_compressed(os.path.join(args.out, 'core_golden.npz'), **out)
    print('Wrote', os.path.join(args.out, 'core_golden.npz'),
          f'({len(out)} arrays)')


if __name__ == '__main__':
    main()
