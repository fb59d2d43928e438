def decode(*args, **kwargs):
    raise NotImplementedError(
        'pycocotools stub: RLE decode is not available in the trajectory '
        'harness (use the rebuild\'s native C codec, data/rle.py)')


def encode(*args, **kwargs):
    raise NotImplementedError('pycocotools stub')
