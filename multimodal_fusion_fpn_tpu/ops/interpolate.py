"""Multi-linear resize with torch ``align_corners=False`` semantics.

Matches ``torch.nn.functional.interpolate(mode='trilinear'/'bilinear',
align_corners=False)``: output coordinate ``i`` samples input coordinate
``(i + 0.5) * n_in / n_out - 0.5`` with edge clamping.  Multi-linear
interpolation is separable, so we apply 1-D linear interpolation per axis;
each step is two gathers and a lerp, which XLA fuses.

Used for the ``relative_2d`` feature alignment (reference
``/root/reference/models/fpn/fusion3D2D.py:427-440``) and the FPN2D
output-to-mask resize (``fusion_nets.py:143-146``).
"""

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _axis_linear(x: jnp.ndarray, axis: int, out: int) -> jnp.ndarray:
    n = x.shape[axis]
    if out == n:
        return x
    coords = (np.arange(out) + 0.5) * (n / out) - 0.5
    lo = np.floor(coords)
    w = (coords - lo).astype(np.float32)
    lo_c = np.clip(lo, 0, n - 1).astype(np.int32)
    hi_c = np.clip(lo + 1, 0, n - 1).astype(np.int32)
    shape = [1] * x.ndim
    shape[axis] = out
    w = jnp.asarray(w.reshape(shape), dtype=x.dtype)
    x_lo = jnp.take(x, jnp.asarray(lo_c), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi_c), axis=axis)
    return x_lo * (1 - w) + x_hi * w


def linear_resize(x: jnp.ndarray, out_sizes: Sequence[int],
                  axes: Sequence[int]) -> jnp.ndarray:
    """Linearly resize ``x`` along ``axes`` to ``out_sizes``."""
    for axis, out in zip(axes, out_sizes):
        x = _axis_linear(x, axis, int(out))
    return x
