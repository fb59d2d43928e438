import numpy as np
import pytest

from nerf_from_image_tpu.data import rle


def test_raw_counts_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(17, 23) > 0.6).astype(np.uint8)
    enc = rle.encode(mask)
    dec = rle.decode(enc)
    np.testing.assert_array_equal(dec, mask)


def test_decode_matches_pycocotools_if_available():
    pycoco = pytest.importorskip('pycocotools.mask')
    rng = np.random.RandomState(1)
    mask = (rng.rand(31, 19) > 0.5).astype(np.uint8)
    enc = pycoco.encode(np.asfortranarray(mask))
    dec = rle.decode({'size': enc['size'], 'counts': enc['counts']})
    np.testing.assert_array_equal(dec, mask)


def test_compressed_string_against_known_vector():
    # Encode with our raw encoder, compress with the LEB scheme by hand via
    # cv2-free check: compressed decode of a simple run pattern.
    mask = np.zeros((4, 4), dtype=np.uint8)
    mask[1:3, 1:3] = 1
    enc = rle.encode(mask)
    dec = rle.decode(enc)
    np.testing.assert_array_equal(dec, mask)
    # Column-major counts for this mask: col0: 4 zeros; col1: 1 zero,
    # 2 ones, 1 zero; ...
    assert enc['counts'][0] == 5  # 4 (col 0) + 1 leading zero of col 1
