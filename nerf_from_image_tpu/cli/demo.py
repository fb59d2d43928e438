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

from typing import Callable, Optional

import numpy as np


def load_manual_image(path_or_url: str, coco_class_id: int,
                      segment_fn: Optional[Callable] = None) -> dict:
    if path_or_url.startswith(('http://', 'https://')):
        raise RuntimeError('URL inputs require network access; download the '
                           'image and pass a local path instead')
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
        print('WARNING: no segmentation model available; using a full-frame '
              'mask. Provide an RGBA image for best results.')
        mask = np.ones(img.shape[:2], dtype=np.float64)

    ys, xs = np.where(mask > 0.5)
    if len(ys) == 0:
        bbox = np.array([0, 0, img.shape[1] - 1, img.shape[0] - 1], float)
    else:
        bbox = np.array([xs.min(), ys.min(), xs.max(), ys.max()], float)

    return {'image': img[..., :3], 'mask': mask[..., None], 'bbox': bbox}
