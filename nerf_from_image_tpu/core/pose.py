"""Camera pose math (pure JAX, differentiable where the reference is).

Parity with /root/reference/lib/pose_utils.py:20-174: cam2world/world2cam
inversion with a scale carried in entry [3, 3], quaternion <-> rotation
matrix, the (z0, t2, s, q) pose parameterization used by the inversion
optimizer, the 13-D discriminator conditioning vector, geodesic rotation
distance, and dataset pose perturbation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def invert_space(mat: jnp.ndarray) -> jnp.ndarray:
    """Converts cam2world <-> world2cam for scaled rigid transforms.

    The [3, 3] entry carries an isotropic scale (ortho cameras); the output
    has R^T / s in the rotation block and [3, 3] = 1.
    """
    rot = jnp.swapaxes(mat[..., :3, :3], -2, -1) / mat[..., 3:4, 3:4]
    t = -jnp.sum(
        mat[..., :3, :3] / mat[..., 3:4, 3:4] * mat[..., :3, None, 3],
        axis=-2)
    out = jnp.zeros_like(mat)
    out = out.at[..., :3, :3].set(rot)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> (B, 3, 3) rotation matrix.

    Implemented by rotating the identity basis (v + 2(w*(u x v) + u x (u x v)))
    so gradients match the reference formulation exactly.
    """
    w = q[..., :1]  # (B, 1)
    u = q[..., 1:]  # (B, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), q.shape[:-1] + (3, 3))
    uv = jnp.cross(u[..., None, :], eye)  # (B, 3, 3): u x e_i rows
    uuv = jnp.cross(u[..., None, :], uv)
    return eye + 2.0 * (w[..., None] * uv + uuv)


def matrix_to_quaternion(matrix: np.ndarray) -> np.ndarray:
    """Rotation (or scaled 4x4) matrix -> quaternion (w, x, y, z). Host-side."""
    m = np.array(matrix, dtype=np.float64, copy=True)
    if m.shape[-1] == 3:
        m4 = np.eye(4)
        m4[:3, :3] = m
        m = m4
    m = m[:4, :4]
    q = np.empty((4,))
    t = np.trace(m)
    if t > m[3, 3]:
        q[0] = t
        q[3] = m[1, 0] - m[0, 1]
        q[2] = m[0, 2] - m[2, 0]
        q[1] = m[2, 1] - m[1, 2]
    else:
        i, j, k = 0, 1, 2
        if m[1, 1] > m[0, 0]:
            i, j, k = 1, 2, 0
        if m[2, 2] > m[i, i]:
            i, j, k = 2, 0, 1
        t = m[i, i] - (m[j, j] + m[k, k]) + m[3, 3]
        q[i] = t
        q[j] = m[i, j] + m[j, i]
        q[k] = m[k, i] + m[i, k]
        q[3] = m[k, j] - m[j, k]
        q = q[[3, 0, 1, 2]]
    q *= 0.5 / np.sqrt(t * m[3, 3])
    return q


def pose_to_matrix(
    z0: Optional[jnp.ndarray],
    t2: jnp.ndarray,
    s: jnp.ndarray,
    q: jnp.ndarray,
    camera_flipped: bool,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(z0, t2, s, quaternion) -> cam2world matrix (+ focal for perspective).

    Perspective: f = 1 + exp(z0); t3 = (t2/s, f/s); focal returned is f/2.
    Ortho: t3 = (t2, 10); matrix divided by s (scale in [3, 3]); focal None.
    """
    rot = quaternion_to_matrix(q)
    b = q.shape[0]
    dtype = q.dtype
    if z0 is not None:
        f = 1.0 + jnp.exp(z0)
        t3 = jnp.concatenate((t2 / s[:, None], (f / s)[:, None]), axis=-1)
        mat = jnp.zeros((b, 4, 4), dtype=dtype)
        mat = mat.at[:, 3, 3].set(1.0)
        mat = mat.at[:, :3, :3].set(rot)
        mat = mat.at[:, :3, 3].set(jnp.sum(t3[:, None, :] * rot, axis=-1))
        if camera_flipped:
            mat = mat.at[:, :3, 1:].multiply(-1.0)
        return mat, f / 2.0
    else:
        mat = jnp.zeros((b, 4, 4), dtype=dtype)
        mat = mat.at[:, 3, 3].set(1.0)
        mat = mat.at[:, :3, :3].set(rot)
        t3 = jnp.concatenate((t2, jnp.full_like(t2[:, :1], 10.0)), axis=-1)
        mat = mat.at[:, :3, 3].set(jnp.sum(t3[:, None, :] * rot, axis=-1))
        if camera_flipped:
            mat = mat.at[:, :3, 1:].multiply(-1.0)
        return mat / s[:, None, None], None


def matrix_to_pose(
    cam2world: jnp.ndarray,
    focal_length: Optional[jnp.ndarray],
    camera_flipped: bool,
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """cam2world (+ focal) -> (z0, t2, s, quaternion). Host-side (numpy quat)."""
    mat = jnp.asarray(cam2world)
    if camera_flipped:
        mat = mat.at[:, :3, 1:].multiply(-1.0)
    m_inv = invert_space(mat)
    t3 = -m_inv[:, :3, 3]

    if focal_length is not None:
        z0 = jnp.log(2.0 * focal_length - 1.0)
        s = 2.0 * focal_length / t3[:, 2]
    else:
        z0 = None
        s = 1.0 / mat[:, 3, 3]

    t2 = t3[:, :2] * s[:, None]
    quats = np.stack(
        [matrix_to_quaternion(m) for m in np.asarray(m_inv)], axis=0)
    return z0, t2, s, jnp.asarray(quats, dtype=mat.dtype)


def matrix_to_conditioning_vector(
    cam2world: jnp.ndarray,
    focal_length: Optional[jnp.ndarray],
    camera_flipped: bool,
) -> jnp.ndarray:
    """13-D discriminator conditioning: (log f, t2, s, flattened R)."""
    mat = cam2world
    if camera_flipped:
        flip = jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=mat.dtype)
        mat = mat * jnp.concatenate(
            (jnp.ones((3, 1), mat.dtype) * flip[None, :],
             jnp.ones((1, 4), mat.dtype)), axis=0)[None]
    m_inv = invert_space(mat)
    rot = m_inv[:, :3, :3].reshape(mat.shape[0], 9)
    t3 = -m_inv[:, :3, 3]

    if focal_length is not None:
        z0 = jnp.log(focal_length)  # Unshifted log (reference convention).
        s = 2.0 * focal_length / t3[:, 2]
    else:
        s = 1.0 / mat[:, 3, 3]
        z0 = jnp.zeros_like(s)

    t2 = t3[:, :2] * s[:, None]
    return jnp.concatenate((z0[:, None], t2, s[:, None], rot), axis=-1)


def rotation_matrix_distance(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Geodesic distance in degrees between rotations (3x3 or scaled 4x4)."""
    if p.shape[-1] == 4:
        p = p[..., :3, :3] / p[..., 3:4, 3:4]
        q = q[..., :3, :3] / q[..., 3:4, 3:4]
    pqt = jnp.matmul(p, jnp.swapaxes(q, -2, -1),
                     precision=jax.lax.Precision.HIGHEST)
    trace = pqt[..., 0, 0] + pqt[..., 1, 1] + pqt[..., 2, 2]
    cos_d = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos_d) / jnp.pi * 180.0


def perturb_poses(
    cam2world: jnp.ndarray,
    avg_angle: float,
    *extra_args,
    seed: int = 1234,
):
    """Randomly reshuffles poses to neighbors at ~U(0, 2*avg_angle) degrees.

    Preserves the pose distribution (indices are a permutation with
    replacement into the original set). Host-side; used once at data load.
    """
    rng = np.random.RandomState(seed)
    mats = np.asarray(cam2world)
    n = mats.shape[0]
    dist_all = np.asarray(
        rotation_matrix_distance(
            jnp.asarray(mats)[:, None], jnp.asarray(mats)[None, :]))
    indices = []
    for row in dist_all:
        target = rng.rand() * avg_angle * 2.0
        indices.append(int(np.abs(row - target).argmin()))
    indices = np.asarray(indices)
    out_extra = [
        (np.asarray(a)[indices].copy() if a is not None else None)
        for a in extra_args
    ]
    return (mats[indices].copy(), *out_extra)
