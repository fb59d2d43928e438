"""Stub `torchvision` for running the reference on this container.

Implements the thin slice the reference touches: transforms
Compose/ToTensor/Normalize/Resize (data/datasets.py:615-629) and
utils.save_image (run.py:2156).
"""

from . import transforms  # noqa: F401
from . import utils  # noqa: F401
