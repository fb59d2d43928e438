from nerf_from_image_tpu.render.renderer import render, RenderOutput
