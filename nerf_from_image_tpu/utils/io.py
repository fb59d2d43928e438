"""File IO with optional gs:// support + misc utilities.

Parity with /root/reference/lib/utils.py:23-113, 163-192: GCS-aware
open/exists/mkdir (via etils.epath or tf.io.gfile when available; plain
filesystem otherwise), the deterministic endless batch sampler, and the
semantic color palette. RNG "state" in the TPU build is just the JAX key
held in the train state — checkpointing the key replaces the reference's
RNG-blob save/restore (lib/utils.py:87-113).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

try:
    from etils import epath as _epath
except ImportError:  # pragma: no cover
    _epath = None


def open_file(path, mode='r'):
    if path.startswith('gs://'):
        if _epath is not None:
            return _epath.Path(path).open(mode)
        try:
            import tensorflow.io.gfile as gfile  # type: ignore
            return gfile.GFile(path, mode)
        except ImportError as e:
            raise RuntimeError('gs:// paths need etils or tensorflow') from e
    return open(path, mode)


def file_exists(path) -> bool:
    if path.startswith('gs://'):
        if _epath is not None:
            return _epath.Path(path).exists()
        try:
            import tensorflow.io.gfile as gfile  # type: ignore
            return gfile.exists(path)
        except ImportError:
            return False
    return os.path.exists(path)


def mkdir(path) -> None:
    if path.startswith('gs://'):
        if _epath is not None:
            _epath.Path(path).mkdir(parents=True, exist_ok=True)
        return
    os.makedirs(path, exist_ok=True)


def save_npz(path, compressed: bool = False, **arrays) -> None:
    """GCS-aware np.savez (the reference writes caches/reports through
    its gfile-backed open_file, lib/utils.py:23-56)."""
    parent = os.path.dirname(path)
    if parent:
        mkdir(parent)
    with open_file(path, 'wb') as f:
        (np.savez_compressed if compressed else np.savez)(f, **arrays)


def load_npz(path) -> dict:
    """GCS-aware np.load for .npz files; materializes all arrays."""
    with open_file(path, 'rb') as f:
        return dict(np.load(f))


class EndlessSampler:
    """Shuffled endless index stream (lib/utils.py:163-192).

    Deterministic given the numpy RandomState; state is (permutation,
    position) and can be checkpointed via get_state/set_state.
    """

    def __init__(self, dataset_size: int, rng: np.random.RandomState):
        self.dataset_size = dataset_size
        self.rng = rng
        self._perm = rng.permutation(dataset_size)
        self._pos = 0

    def __call__(self, batch_size: int) -> np.ndarray:
        out = []
        while len(out) < batch_size:
            if self._pos >= self.dataset_size:
                self._perm = self.rng.permutation(self.dataset_size)
                self._pos = 0
            take = min(batch_size - len(out), self.dataset_size - self._pos)
            out.extend(self._perm[self._pos:self._pos + take].tolist())
            self._pos += take
        return np.asarray(out)

    def get_state(self):
        return {'perm': self._perm.copy(), 'pos': self._pos,
                'rng': self.rng.get_state()}

    def set_state(self, state):
        self._perm = np.asarray(state['perm'])
        self._pos = int(state['pos'])
        # 'rng' is optional: checkpoint.apply_host_state restores the
        # (shared) RandomState separately from the packed npz.
        if 'rng' in state:
            self.rng.set_state(state['rng'])


def get_color_palette(n: int) -> np.ndarray:
    """Distinct semantic colors in [-1, 1] (lib/utils.py color palette)."""
    import colorsys
    colors = [colorsys.hsv_to_rgb(i / n, 0.65, 0.9) for i in range(n)]
    return np.asarray(colors, dtype=np.float32) * 2.0 - 1.0
