"""Checkpointing via orbax, mirroring the reference checkpoint families.

Reference families (SURVEY §5): GAN checkpoints
(checkpoint_{latest,best,N}: G, G-EMA, D, both optimizers, iteration, RNG
state, lrs, best_fid, ADA p, ppl avg; run.py:1474-1516), encoder
checkpoints (run.py:1575-1592), and the inversion report checkpoint
(run.py:2329-2336). In this build the full state lives in a single pytree
(GANTrainState holds the RNG key; the lr is a pure function of the opt
step count), so one orbax save captures the reference's logical contents.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from nerf_from_image_tpu.utils import io as io_lib


def _canon(path: str) -> str:
    """abspath for local paths; gs:// URIs pass through untouched
    (os.path.abspath would mangle the scheme; orbax handles gs:// via
    etils — reference IO is GCS-capable throughout, lib/utils.py:23-56).
    """
    return path if path.startswith('gs://') else os.path.abspath(path)


def save_pytree(path: str, tree: Any, extra_metadata: Optional[dict] = None):
    """Saves a pytree checkpoint to `path` (a directory)."""
    path = _canon(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, tree, force=True)
    ckpt.wait_until_finished()
    if extra_metadata:
        import json
        with io_lib.open_file(os.path.join(path, 'nfi_metadata.json'),
                              'w') as f:
            json.dump(extra_metadata, f)


def restore_pytree(path: str, target: Any) -> Any:
    """Restores a pytree checkpoint with `target`'s structure/shardings."""
    path = _canon(path)
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, target=target)


def load_metadata(path: str) -> dict:
    import json
    meta_path = os.path.join(_canon(path), 'nfi_metadata.json')
    if io_lib.file_exists(meta_path):
        with io_lib.open_file(meta_path) as f:
            return json.load(f)
    return {}


class CheckpointManager:
    """latest/best/step-N checkpoint policy (run.py:1511-1516 semantics)."""

    def __init__(self, directory: str):
        self.directory = _canon(directory)
        io_lib.mkdir(self.directory)

    def _path(self, label: str) -> str:
        return os.path.join(self.directory, f'checkpoint_{label}')

    def save(self, tree: Any, label: str = 'latest',
             metadata: Optional[dict] = None,
             host_state: Optional[dict] = None):
        save_pytree(self._path(label), tree, metadata)
        if host_state is not None:
            with io_lib.open_file(
                    os.path.join(self._path(label), 'host_state.npz'),
                    'wb') as f:
                np.savez(f, **host_state)

    def restore(self, target: Any, label: str = 'latest') -> Any:
        return restore_pytree(self._path(label), target)

    def restore_host_state(self, label: str = 'latest') -> Optional[dict]:
        path = os.path.join(self._path(label), 'host_state.npz')
        if not io_lib.file_exists(path):
            return None
        with io_lib.open_file(path, 'rb') as f:
            return dict(np.load(f))

    def exists(self, label: str = 'latest') -> bool:
        return io_lib.file_exists(self._path(label))

    def metadata(self, label: str = 'latest') -> dict:
        return load_metadata(self._path(label))


# ---- Host-side state (bit-exact resume) --------------------------------
#
# The reference checkpoints the numpy/torch RNG state per device AND the
# batch-sampler state and best_fid (run.py:1474-1516, lib/utils.py:87-113)
# so a resumed run reproduces the exact batch order and checkpoint_best
# gating. The device-side RNG key lives in the GANTrainState pytree; the
# host-side pieces (numpy RandomState, EndlessSampler permutation/position,
# host PRNG key, best FID) are packed here into a sidecar npz saved next
# to the orbax checkpoint.

def pack_host_state(rng_np: np.random.RandomState, sampler=None,
                    host_key=None, **extra) -> dict:
    st = rng_np.get_state()
    out = {
        'np_mt_keys': np.asarray(st[1], np.uint32),
        'np_mt_pos': np.asarray(st[2], np.int64),
        'np_has_gauss': np.asarray(st[3], np.int64),
        'np_cached_gaussian': np.asarray(st[4], np.float64),
    }
    if sampler is not None:
        ss = sampler.get_state()
        out['sampler_perm'] = np.asarray(ss['perm'])
        out['sampler_pos'] = np.asarray(ss['pos'], np.int64)
    if host_key is not None:
        out['host_key'] = np.asarray(host_key)
    for k, v in extra.items():
        out[k] = np.asarray(v)
    return out


def apply_host_state(hs: dict, rng_np: np.random.RandomState,
                     sampler=None):
    """Restores rng_np (in place) and the sampler; returns the host key
    array (or None). Partial host states are allowed (a converted torch
    checkpoint carries only best_fid — torch RNG state has no numpy
    equivalent): absent pieces keep their fresh-start values."""
    if 'np_mt_keys' in hs:
        rng_np.set_state(('MT19937',
                          np.asarray(hs['np_mt_keys'], np.uint32),
                          int(hs['np_mt_pos']), int(hs['np_has_gauss']),
                          float(hs['np_cached_gaussian'])))
    if sampler is not None and 'sampler_perm' in hs:
        sampler.set_state({'perm': np.asarray(hs['sampler_perm']),
                           'pos': int(hs['sampler_pos'])})
    return hs.get('host_key')
