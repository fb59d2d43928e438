import numpy as np
import torch


def save_image(tensor, path, **kwargs):
    from PIL import Image
    t = tensor.detach().cpu()
    if t.ndim == 4:
        t = torch.cat(list(t), dim=-1)
    arr = (t.clamp(0, 1).numpy().transpose(1, 2, 0) * 255).astype(np.uint8)
    Image.fromarray(arr.squeeze()).save(path)
