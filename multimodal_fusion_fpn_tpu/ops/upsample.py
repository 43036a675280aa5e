"""Index-gather nearest-neighbor upsampling.

Bit-exact semantics of the reference's ``Upsample_Custom3d_nearest`` /
``Upsample_Custom2d_nearest`` (``/root/reference/models/fpn/components.py:
230-323``): along each axis the output index ``i`` (1-based) gathers input
index ``ceil(i / scale) - 1``, with output length ``floor(n * scale)``.

This is *not* ``jax.image.resize(method='nearest')`` — at non-integer
scales the ceil formula picks different source pixels.  For integer scales
the gather degenerates to an element repeat, which is what the shipped
architectures use (scales 1 and 2), so we take the cheap ``jnp.repeat``
path there; XLA lowers it to a broadcast-reshape with no gather.
"""

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _ceil_indices(n_in: int, scale: float) -> np.ndarray:
    n_out = int(n_in * scale)
    return (np.ceil(np.arange(1, 1 + n_out) / scale) - 1).astype(np.int32)


def upsample_nearest(x: jnp.ndarray, scale: Sequence[float],
                     axes: Sequence[int]) -> jnp.ndarray:
    """Upsample ``x`` along ``axes`` by per-axis ``scale`` factors.

    Args:
        x: input array (any rank).
        scale: per-axis multipliers (ints or floats), same length as axes.
        axes: the spatial axes to upsample.
    """
    for axis, f in zip(axes, scale):
        if f == 1:
            continue
        if float(f).is_integer():
            x = jnp.repeat(x, int(f), axis=axis)
        else:
            idx = _ceil_indices(x.shape[axis], float(f))
            x = jnp.take(x, jnp.asarray(idx), axis=axis)
    return x
