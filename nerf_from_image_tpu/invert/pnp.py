"""Host-side PnP pose estimation (ctypes binding to the native solver).

Same contract as the reference (/root/reference/lib/pose_estimation.py:
30-143): per-image foreground correspondences between predicted canonical
coordinates and the pixel grid, a sweep over ~11 focal-length percentiles,
positive-depth validity with a dummy-pose fallback, iterative refinement,
and the diag(1,-1,-1) camera flip — implemented by the C++ EPnP+LM solver
in native/pnp.cc (built via native/Makefile; auto-built on first use).

`estimate_poses_batch` additionally reproduces the ortho-camera proxy
(run.py:1709-1740: solve with focal=100, then convert back to ortho).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / 'native'
_LIB_PATH = _NATIVE_DIR / 'libnfi_pnp.so'
_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(['make', '-C', str(_NATIVE_DIR), 'libnfi_pnp.so'],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.nfi_solve_pnp_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # coords
        ctypes.POINTER(ctypes.c_uint8),  # masks
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # bs, h, w
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,  # focals, n_focals
        ctypes.c_int,  # refine
        ctypes.POINTER(ctypes.c_double),  # out_world2cam
        ctypes.POINTER(ctypes.c_double),  # out_focal
        ctypes.POINTER(ctypes.c_double),  # out_err
    ]
    lib.nfi_solve_pnp_batch.restype = None
    _lib = lib
    return lib


def compute_pose_pnp(coords: np.ndarray, masks: np.ndarray,
                     focal_proposals, refine: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """coords: (B, H, W, 3); masks: (B, H, W) bool.

    Returns (world2cam (B, 4, 4), focal (B,), errors (B,)) — world2cam
    already includes the reference's diag(1,-1,-1) flip.
    """
    lib = _load_library()
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    masks = np.ascontiguousarray(masks.astype(np.uint8))
    focals = np.ascontiguousarray(np.asarray(focal_proposals,
                                             dtype=np.float64))
    bs, h, w, _ = coords.shape
    out_mat = np.zeros((bs, 16), dtype=np.float64)
    out_focal = np.zeros((bs,), dtype=np.float64)
    out_err = np.zeros((bs,), dtype=np.float64)

    lib.nfi_solve_pnp_batch(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bs, h, w,
        focals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(focals), int(refine),
        out_mat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_focal.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

    return out_mat.reshape(bs, 4, 4), out_focal, out_err


def get_focal_guesses(focal_length) -> Optional[np.ndarray]:
    """Focal proposals = percentiles of training focals
    (lib/pose_estimation.py:134-143)."""
    if focal_length is None:
        return None
    sorted_focals = np.sort(np.asarray(focal_length).copy())
    guesses = np.percentile(sorted_focals,
                            [1, 10, 20, 30, 40, 50, 60, 70, 80, 90, 99])
    return np.unique(guesses)


def _invert_space_np(mat: np.ndarray) -> np.ndarray:
    out = np.zeros_like(mat)
    scale = mat[:, 3:4, 3:4]
    out[:, :3, :3] = np.swapaxes(mat[:, :3, :3], -2, -1) / scale
    out[:, 3, 3] = 1.0
    out[:, :3, 3] = -np.sum(mat[:, :3, :3] / scale * mat[:, :3, None, 3],
                            axis=-2)
    return out


def estimate_poses_batch(target_coords: np.ndarray, target_mask: np.ndarray,
                         focal_guesses: Optional[np.ndarray]
                         ) -> Tuple[np.ndarray, Optional[np.ndarray],
                                    np.ndarray]:
    """Full bootstrap pose estimation (run.py:1709-1740).

    target_coords: (B, H, W, 3); target_mask: (B, H, W) in [0, 1].
    Returns (cam2world (B, 4, 4), focal (B,) or None for ortho, errors).
    """
    mask = np.asarray(target_mask) > 0.9
    is_ortho = focal_guesses is None
    if is_ortho:
        focal_guesses = np.asarray([100.0])

    world2cam, focal, errors = compute_pose_pnp(
        np.asarray(target_coords), mask, focal_guesses)

    if is_ortho:
        s = 2.0 * focal_guesses[0] / -world2cam[:, 2, 3]
        t2 = world2cam[:, :2, 3] * s[..., None]
        world2cam = world2cam.copy()
        world2cam[:, :2, 3] = t2
        world2cam[:, 2, 3] = -10.0

    cam2world = _invert_space_np(world2cam)
    if is_ortho:
        cam2world = cam2world / s[:, None, None]
        return cam2world.astype(np.float32), None, errors

    return cam2world.astype(np.float32), focal.astype(np.float32), errors
