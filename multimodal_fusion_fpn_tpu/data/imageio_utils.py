"""Thin image-IO shims (the reference uses ``skimage.io``; this
environment provides ``imageio``/PIL instead)."""

import numpy as np


def imread(path: str) -> np.ndarray:
    import imageio.v2 as iio
    return np.asarray(iio.imread(path))


def imsave(path: str, array: np.ndarray) -> None:
    import imageio.v2 as iio
    iio.imwrite(path, array)
