"""Stub `skimage` package for running the reference on this container.

Provides `skimage.metrics.structural_similarity` (numpy, skimage-default
semantics: uniform 7x7 window, reflect padding, unbiased covariance,
win//2 border crop) and a minimal `skimage.io.imread`. The SSIM math
mirrors nerf_from_image_tpu/metrics/image.py::ssim, which is itself
cross-checked against a scipy.ndimage oracle (tests/test_metrics.py).
"""

from . import io  # noqa: F401
from . import metrics  # noqa: F401
