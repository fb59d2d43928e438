import imageio


def imread(path):
    return imageio.imread(path)
