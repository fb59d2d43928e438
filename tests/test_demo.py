"""Manual-image demo loading (--inv_manual_input_path): alpha-channel
masks, the GrabCut RGB fallback (reference uses Mask R-CNN,
lib/utils.py:116-160), bbox extraction, and segment_fn precedence."""

import numpy as np
import pytest

from nerf_from_image_tpu.cli import demo


def _subject_image(h=96, w=96, y0=24, y1=72, x0=30, x1=66):
    """Dark background, bright textured centered rectangle."""
    rng = np.random.RandomState(0)
    img = 0.05 + 0.02 * rng.rand(h, w, 3)
    img[y0:y1, x0:x1] = 0.7 + 0.25 * rng.rand(y1 - y0, x1 - x0, 3)
    return img.astype(np.float64)


def test_grabcut_foreground_finds_centered_subject():
    pytest.importorskip('cv2')
    img = _subject_image()
    mask = demo.grabcut_foreground(img)
    assert mask is not None and mask.shape == img.shape[:2]
    inside = mask[30:66, 36:60]
    outside = np.concatenate([mask[:18].ravel(), mask[78:].ravel(),
                              mask[:, :24].ravel(), mask[:, 72:].ravel()])
    assert inside.mean() > 0.9, inside.mean()
    assert outside.mean() < 0.1, outside.mean()


def test_grabcut_degenerate_returns_none():
    pytest.importorskip('cv2')
    # Uniform image: segmentation is degenerate (all fg or all bg).
    assert demo.grabcut_foreground(np.full((64, 64, 3), 0.5)) is None
    # Too small to seed.
    assert demo.grabcut_foreground(np.full((8, 8, 3), 0.5)) is None


def test_load_manual_image_alpha_channel(tmp_path):
    from PIL import Image
    rgba = np.zeros((40, 40, 4), np.uint8)
    rgba[..., :3] = 128
    rgba[10:30, 5:25, 3] = 255  # alpha subject
    p = tmp_path / 'a.png'
    Image.fromarray(rgba).save(p)
    out = demo.load_manual_image(str(p), coco_class_id=2)
    assert out['image'].shape == (40, 40, 3)
    assert out['mask'].shape == (40, 40, 1)
    np.testing.assert_array_equal(
        np.argwhere(out['mask'][..., 0] > 0.5).min(axis=0), [10, 5])
    np.testing.assert_allclose(out['bbox'], [5, 10, 24, 29])


def test_load_manual_image_segment_fn_precedence(tmp_path):
    from PIL import Image
    img = (np.clip(_subject_image(), 0, 1) * 255).astype(np.uint8)
    p = tmp_path / 'b.png'
    Image.fromarray(img).save(p)
    calls = []

    def seg(im, cls):
        calls.append(cls)
        m = np.zeros(im.shape[:2])
        m[2:6, 3:9] = 1.0
        return m

    out = demo.load_manual_image(str(p), coco_class_id=7, segment_fn=seg)
    assert calls == [7]
    np.testing.assert_allclose(out['bbox'], [3, 2, 8, 5])


def test_select_largest_of_class_reference_semantics():
    """lib/utils.py:147-153: filter to the requested COCO class, pick the
    LARGEST instance of that class (not the largest overall)."""
    masks = np.zeros((3, 8, 8), bool)
    masks[0, :, :] = True       # huge, wrong class
    masks[1, 0:2, 0:2] = True   # small, right class
    masks[2, 0:4, 0:4] = True   # larger, right class
    classes = np.array([5, 2, 2])
    out = demo.select_largest_of_class(classes, masks, coco_class_id=2)
    np.testing.assert_array_equal(out > 0.5, masks[2])
    with pytest.raises(RuntimeError, match='COCO class 9'):
        demo.select_largest_of_class(classes, masks, coco_class_id=9)


def test_load_manual_image_mask_file_precedence(tmp_path):
    """--inv_manual_mask_path outranks segment_fn/alpha/GrabCut."""
    from PIL import Image
    rgba = np.zeros((40, 40, 4), np.uint8)
    rgba[..., :3] = 128
    rgba[10:30, 5:25, 3] = 255  # alpha subject (must NOT be used)
    p = tmp_path / 'img.png'
    Image.fromarray(rgba).save(p)
    m = np.zeros((40, 40), np.uint8)
    m[3:7, 8:14] = 255
    mp = tmp_path / 'mask.png'
    Image.fromarray(m).save(mp)

    def seg(im, cls):  # must not be called
        raise AssertionError('segment_fn called despite mask_path')

    out = demo.load_manual_image(str(p), coco_class_id=2, segment_fn=seg,
                                 mask_path=str(mp))
    np.testing.assert_allclose(out['bbox'], [8, 3, 13, 6])
    with pytest.raises(ValueError, match='mask shape'):
        bad = tmp_path / 'bad.png'
        Image.fromarray(m[:20]).save(bad)
        demo.load_manual_image(str(p), coco_class_id=2,
                               mask_path=str(bad))


def test_load_manual_image_rgb_uses_grabcut(tmp_path):
    pytest.importorskip('cv2')
    from PIL import Image
    img = (np.clip(_subject_image(), 0, 1) * 255).astype(np.uint8)
    p = tmp_path / 'c.png'
    Image.fromarray(img).save(p)
    out = demo.load_manual_image(str(p), coco_class_id=2)
    # GrabCut mask -> bbox roughly the subject rectangle.
    x0, y0, x1, y1 = out['bbox']
    assert 20 <= x0 <= 36 and 16 <= y0 <= 30
    assert 60 <= x1 <= 72 and 66 <= y1 <= 78


def test_load_manual_image_url_downloads(tmp_path, monkeypatch):
    """URL inputs are fetched and processed like local paths (reference
    lib/utils.py:116-160 accepts URLs); hermetic via a stubbed urlopen."""
    import io
    import urllib.request
    from PIL import Image

    img = (np.clip(_subject_image(), 0, 1) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format='PNG')
    payload = buf.getvalue()

    class FakeResponse(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    seen = {}

    def fake_urlopen(url, timeout=None):
        seen['url'] = url
        return FakeResponse(payload)

    monkeypatch.setattr(urllib.request, 'urlopen', fake_urlopen)

    def seg(im, cls):
        m = np.zeros(im.shape[:2])
        m[2:6, 3:9] = 1.0
        return m

    out = demo.load_manual_image('https://example.com/bird.png',
                                 coco_class_id=14, segment_fn=seg)
    assert seen['url'] == 'https://example.com/bird.png'
    np.testing.assert_allclose(out['bbox'], [3, 2, 8, 5])
