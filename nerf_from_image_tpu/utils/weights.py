"""Converted-weight asset IO.

scripts/convert_weights.py writes each converted reference checkpoint
(SURVEY §7.3.1) as a single .npz: the FULL flax variables tree —
including the collection roots ('params', and 'batch_stats' for the
FID Inception) — flattened with '/'-joined keys. Both CLIs load the
assets through load_npz_variables, so the on-disk format has exactly
one producer and one parser.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from nerf_from_image_tpu.utils import io as io_lib


def flatten_variables(tree: Dict[str, Any], prefix: str = '') -> dict:
    out = {}
    for k, v in tree.items():
        key = f'{prefix}/{k}' if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_variables(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_npz_variables(tree: Dict[str, Any], path: str) -> None:
    """Writes a variables tree (with collection roots) as a flat .npz."""
    flat = flatten_variables(tree)
    io_lib.save_npz(path, **flat)
    print(f'wrote {path} ({len(flat)} arrays, '
          f'{sum(v.nbytes for v in flat.values()) / 1e6:.1f} MB)')


def load_npz_variables(path: str) -> Optional[Dict[str, Any]]:
    """Loads a flat .npz back into the variables tree, or None if the
    file does not exist. The result is apply-ready: the collection roots
    were flattened INTO the keys, so no extra {'params': ...} nesting is
    added here (re-wrapping was a real bug: flax then looked up modules
    under variables['params']['params'])."""
    if not io_lib.file_exists(path):
        return None
    import flax

    flat = io_lib.load_npz(path)
    return flax.traverse_util.unflatten_dict(
        {tuple(k.split('/')): v for k, v in flat.items()})
