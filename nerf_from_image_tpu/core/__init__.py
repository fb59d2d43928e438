from nerf_from_image_tpu.core import rays
from nerf_from_image_tpu.core import sampling
from nerf_from_image_tpu.core import compositing
from nerf_from_image_tpu.core import pose
from nerf_from_image_tpu.core import grids
