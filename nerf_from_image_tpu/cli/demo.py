"""Manual-image demo input loading (the --inv_manual_input_path path).

Mirrors /root/reference/lib/utils.py:116-160: loads an image from a path
(URLs require network; unsupported in hermetic environments), obtains a
foreground mask for the requested COCO class, and returns
{image, mask, bbox} for loaders.insert_manual_image.

The reference depends on detectron2 Mask R-CNN; here any instance
segmentation callable can be plugged in (`segment_fn`), with graceful
fallbacks: an alpha channel if present, else a full-frame mask with a
warning.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def load_manual_image(path_or_url: str, coco_class_id: int,
                      segment_fn: Optional[Callable] = None) -> dict:
    if path_or_url.startswith(('http://', 'https://')):
        # The reference accepts URLs here (lib/utils.py:116-160).
        import tempfile
        import urllib.request
        try:
            suffix = os.path.splitext(path_or_url.split('?')[0])[1] or '.jpg'
            with urllib.request.urlopen(path_or_url, timeout=30) as r, \
                    tempfile.NamedTemporaryFile(suffix=suffix,
                                                delete=False) as f:
                f.write(r.read())
                path_or_url = f.name
        except Exception as e:
            raise RuntimeError(
                f'could not download {path_or_url} ({e}); if this '
                'machine has no network access, download the image and '
                'pass a local path instead') from e
    from nerf_from_image_tpu.data.datasets import imread
    img = imread(path_or_url)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)

    mask = None
    if segment_fn is not None:
        mask = segment_fn(img, coco_class_id)
    if mask is None and img.shape[-1] == 4:
        mask = (img[..., 3] > 0.5).astype(np.float64)
        img = img[..., :3]
    if mask is None:
        mask = grabcut_foreground(img)
        if mask is not None:
            print('Using GrabCut foreground segmentation (no instance-'
                  'segmentation model available; reference uses Mask '
                  'R-CNN, lib/utils.py:116-160).')
    if mask is None:
        print('WARNING: no segmentation available; using a full-frame '
              'mask. Provide an RGBA image for best results.')
        mask = np.ones(img.shape[:2], dtype=np.float64)

    mask = np.asarray(mask, np.float64)
    ys, xs = np.where(mask > 0.5)
    if len(ys) == 0:
        bbox = np.array([0, 0, img.shape[1] - 1, img.shape[0] - 1], float)
    else:
        bbox = np.array([xs.min(), ys.min(), xs.max(), ys.max()], float)

    return {'image': img[..., :3], 'mask': mask[..., None], 'bbox': bbox}


def grabcut_foreground(img: np.ndarray,
                       border_frac: float = 0.04,
                       iters: int = 5) -> Optional[np.ndarray]:
    """Foreground mask via OpenCV GrabCut, seeded with an image-border
    background prior (the subject of a demo photo is centered). A real
    instance-segmentation callable (`segment_fn`) takes precedence; this
    is the no-extra-model fallback for plain RGB inputs. Returns float64
    (H, W) in {0, 1}, or None when cv2 is unavailable / the result is
    degenerate."""
    try:
        import cv2
    except ImportError:
        return None
    h, w = img.shape[:2]
    if min(h, w) < 32:
        return None
    img8 = np.ascontiguousarray(
        np.clip(np.asarray(img[..., :3], np.float64), 0, 1) * 255
    ).astype(np.uint8)
    gc_mask = np.full((h, w), cv2.GC_PR_FGD, np.uint8)
    b = max(2, int(round(border_frac * min(h, w))))
    gc_mask[:b, :] = cv2.GC_BGD
    gc_mask[-b:, :] = cv2.GC_BGD
    gc_mask[:, :b] = cv2.GC_BGD
    gc_mask[:, -b:] = cv2.GC_BGD
    bg_model = np.zeros((1, 65), np.float64)
    fg_model = np.zeros((1, 65), np.float64)
    try:
        cv2.grabCut(img8, gc_mask, None, bg_model, fg_model, iters,
                    cv2.GC_INIT_WITH_MASK)
    except cv2.error:
        return None
    fg = np.isin(gc_mask, (cv2.GC_FGD, cv2.GC_PR_FGD))
    frac = fg.mean()
    if frac < 0.01 or frac > 0.98:  # degenerate segmentation
        return None
    # Keep the largest connected component (instance-like behavior).
    n, labels = cv2.connectedComponents(fg.astype(np.uint8))
    if n > 2:
        sizes = [(labels == i).sum() for i in range(1, n)]
        fg = labels == (1 + int(np.argmax(sizes)))
    return fg.astype(np.float64)
