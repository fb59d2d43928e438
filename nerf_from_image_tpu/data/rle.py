"""COCO RLE mask codec (ctypes binding to native/rle.cc).

Replaces the reference's pycocotools dependency
(/root/reference/data/datasets.py:73, 275): decodes both compressed
(LEB128-style string) and raw-counts RLE into row-major uint8 masks, and
encodes masks back to raw counts. Column-major (Fortran) run order per the
COCO spec.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Dict, List, Union

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / 'native'
_LIB_PATH = _NATIVE_DIR / 'librle.so'
_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(['make', '-C', str(_NATIVE_DIR), 'librle.so'],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.nfi_rle_decode_mask.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                        ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_uint8)]
    lib.nfi_rle_decode_mask.restype = ctypes.c_int
    lib.nfi_rle_counts_to_mask.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)
    ]
    lib.nfi_rle_counts_to_mask.restype = None
    lib.nfi_rle_encode_mask.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int
    ]
    lib.nfi_rle_encode_mask.restype = ctypes.c_int
    _lib = lib
    return lib


def decode(rle: Dict) -> np.ndarray:
    """Decodes a COCO RLE dict {'size': [h, w], 'counts': str|list}."""
    lib = _load_library()
    h, w = rle['size']
    out = np.zeros((h, w), dtype=np.uint8)
    counts = rle['counts']
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, str):
            counts = counts.encode('ascii')
        ret = lib.nfi_rle_decode_mask(
            counts, h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if ret != 0:
            raise ValueError('Invalid compressed RLE string')
    else:
        arr = np.ascontiguousarray(np.asarray(counts, dtype=np.int64))
        lib.nfi_rle_counts_to_mask(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(arr), h,
            w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def encode(mask: np.ndarray) -> Dict:
    """Encodes a binary mask to raw-counts RLE."""
    lib = _load_library()
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    counts = np.zeros(h * w + 2, dtype=np.int64)
    n = lib.nfi_rle_encode_mask(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(counts))
    if n < 0:
        raise ValueError('RLE encode overflow')
    return {'size': [h, w], 'counts': counts[:n].tolist()}
