from nerf_from_image_tpu.parallel.mesh import (create_mesh, shard_batch,
                                               replicate)
from nerf_from_image_tpu.parallel.distributed import (maybe_initialize,
                                                      is_main_process)
