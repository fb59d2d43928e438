import numpy as np
from scipy import ndimage


def structural_similarity(im1, im2, channel_axis=None, data_range=None,
                          win_size=7, K1=0.01, K2=0.03):
    im1 = np.asarray(im1, dtype=np.float64)
    im2 = np.asarray(im2, dtype=np.float64)
    assert im1.shape == im2.shape
    if data_range is None:
        raise ValueError('data_range required for float inputs')

    if channel_axis is not None:
        vals = [
            structural_similarity(np.take(im1, c, axis=channel_axis),
                                  np.take(im2, c, axis=channel_axis),
                                  data_range=data_range, win_size=win_size,
                                  K1=K1, K2=K2)
            for c in range(im1.shape[channel_axis])
        ]
        return float(np.mean(vals))

    filt = lambda x: ndimage.uniform_filter(x, size=win_size,
                                            mode='reflect')
    n = win_size ** im1.ndim
    cov_norm = n / (n - 1.0)
    ux, uy = filt(im1), filt(im2)
    uxx, uyy, uxy = filt(im1 * im1), filt(im2 * im2), filt(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2))
    pad = (win_size - 1) // 2
    crop = tuple(slice(pad, d - pad) for d in s.shape)
    return float(s[crop].mean())
