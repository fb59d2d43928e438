from nerf_from_image_tpu.parallel.mesh import (create_mesh, shard_batch,
                                               replicate)
