from nerf_from_image_tpu.metrics.image import psnr, ssim, iou
from nerf_from_image_tpu.metrics.fid import (calculate_stats,
                                             calculate_frechet_distance)
