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


def save_pytree(path: str, tree: Any, extra_metadata: Optional[dict] = None):
    """Saves a pytree checkpoint to `path` (a directory)."""
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, tree, force=True)
    ckpt.wait_until_finished()
    if extra_metadata:
        import json
        with open(os.path.join(path, 'nfi_metadata.json'), 'w') as f:
            json.dump(extra_metadata, f)


def restore_pytree(path: str, target: Any) -> Any:
    """Restores a pytree checkpoint with `target`'s structure/shardings."""
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, target=target)


def load_metadata(path: str) -> dict:
    import json
    meta_path = os.path.join(os.path.abspath(path), 'nfi_metadata.json')
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


class CheckpointManager:
    """latest/best/step-N checkpoint policy (run.py:1511-1516 semantics)."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)

    def _path(self, label: str) -> str:
        return os.path.join(self.directory, f'checkpoint_{label}')

    def save(self, tree: Any, label: str = 'latest',
             metadata: Optional[dict] = None):
        save_pytree(self._path(label), tree, metadata)

    def restore(self, target: Any, label: str = 'latest') -> Any:
        return restore_pytree(self._path(label), target)

    def exists(self, label: str = 'latest') -> bool:
        return os.path.exists(self._path(label))

    def metadata(self, label: str = 'latest') -> dict:
        return load_metadata(self._path(label))
