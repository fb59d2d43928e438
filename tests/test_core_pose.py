import jax.numpy as jnp
import numpy as np

from nerf_from_image_tpu.core import pose


def _close(a, b, tol=1e-5):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol, atol=tol)


def test_invert_space(golden):
    _close(pose.invert_space(jnp.asarray(golden['pose_persp'])),
           golden['inv_persp'])
    _close(pose.invert_space(jnp.asarray(golden['pose_ortho'])),
           golden['inv_ortho'], 1e-4)


def test_invert_space_roundtrip(golden):
    # Involution only holds for unscaled matrices ([3, 3] == 1); scaled
    # ortho matrices fold the scale into the rotation block on inversion.
    m = jnp.asarray(golden['pose_persp'])
    _close(pose.invert_space(pose.invert_space(m)), np.asarray(m), 1e-4)


def test_quaternion_to_matrix(golden):
    _close(pose.quaternion_to_matrix(jnp.asarray(golden['quat'])),
           golden['quat_mat'])


def test_pose_to_matrix(golden):
    z0 = jnp.asarray(golden['p2m_z0'])
    t2 = jnp.asarray(golden['p2m_t2'])
    s = jnp.asarray(golden['p2m_s'])
    q = jnp.asarray(golden['quat'])
    for flipped, sfx in ((False, ''), (True, '_flip')):
        mat, f = pose.pose_to_matrix(z0, t2, s, q, flipped)
        _close(mat, golden[f'p2m_mat{sfx}'], 1e-4)
        _close(f, golden[f'p2m_f{sfx}'])
        mat_o, f_o = pose.pose_to_matrix(None, t2, s, q, flipped)
        assert f_o is None
        _close(mat_o, golden[f'p2m_mat_ortho{sfx}'], 1e-4)


def test_matrix_to_pose_roundtrip(golden):
    for flipped, sfx in ((False, ''), (True, '_flip')):
        mat = jnp.asarray(golden[f'p2m_mat{sfx}'])
        f = jnp.asarray(golden[f'p2m_f{sfx}'])
        z0, t2, s, q = pose.matrix_to_pose(mat, f, flipped)
        _close(z0, golden[f'm2p_z0{sfx}'], 1e-4)
        _close(t2, golden[f'm2p_t2{sfx}'], 1e-4)
        _close(s, golden[f'm2p_s{sfx}'], 1e-4)
        _close(q, golden[f'm2p_q{sfx}'], 1e-4)


def test_conditioning_vector(golden):
    for flipped, sfx in ((False, ''), (True, '_flip')):
        cond = pose.matrix_to_conditioning_vector(
            jnp.asarray(golden['pose_persp']), jnp.asarray(golden['focal']),
            flipped)
        _close(cond, golden[f'cond_vec{sfx}'], 1e-4)


def test_rotation_distance(golden):
    d = pose.rotation_matrix_distance(jnp.asarray(golden['pose_persp']),
                                      jnp.asarray(golden['rotd_other']))
    _close(d, golden['rotd'], 1e-3)
