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


def _coco_compress(cnts):
    """Independent pure-Python COCO compressed-RLE writer, implemented
    from the documented format (6-bit chars, 5 value bits + 1 more-bit,
    offset 48, counts delta-coded against cnts[i-2] for i > 2). Serves
    as a second implementation cross-checking native/rle.cc where
    pycocotools is unavailable."""
    s = []
    for i in range(len(cnts)):
        x = int(cnts[i])
        if i > 2:
            x -= int(cnts[i - 2])
        more = True
        while more:
            c = x & 0x1f
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or
                        (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            s.append(chr(c + 48))
    return ''.join(s).encode('ascii')


def _column_major_counts(mask):
    flat = np.asarray(mask, np.uint8).flatten(order='F')
    counts, cur, run = [], 0, 0
    for v in flat:
        if v == cur:
            run += 1
        else:
            counts.append(run)
            cur, run = v, 1
    counts.append(run)
    return counts


@pytest.mark.parametrize('seed,h,w', [(0, 17, 23), (1, 64, 48), (2, 7, 5)])
def test_native_decode_matches_independent_compressor(seed, h, w):
    rng = np.random.RandomState(seed)
    mask = (rng.rand(h, w) > 0.5).astype(np.uint8)
    counts = _column_major_counts(mask)
    enc = {'size': [h, w], 'counts': _coco_compress(counts)}
    dec = rle.decode(enc)
    np.testing.assert_array_equal(dec, mask)


def test_native_decode_known_vector():
    """A hand-checkable compressed string: 2x2 all-ones mask ->
    column-major counts [0, 4]."""
    enc = {'size': [2, 2], 'counts': _coco_compress([0, 4])}
    dec = rle.decode(enc)
    np.testing.assert_array_equal(dec, np.ones((2, 2), np.uint8))
