"""Adaptive max pooling with torch semantics.

Matches ``torch.nn.functional.adaptive_max_pool3d``: output cell ``i``
along an axis of input length ``n`` and output length ``m`` maxes over
the window ``[floor(i*n/m), ceil((i+1)*n/m))``.  The pooling box is a
product of per-axis windows, so the joint max decomposes into sequential
per-axis maxes — each axis is reduced independently, which keeps the
gathers small and XLA-friendly.

Used by the hybrid/late fusion architectures to align 2D en-face features
to the 3D pyramid resolution in ``relative_2d_max`` mode (reference
``/root/reference/models/fpn/fusion3D2D.py:441-453``).
"""

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _axis_adaptive_max(x: jnp.ndarray, axis: int, out: int) -> jnp.ndarray:
    n = x.shape[axis]
    if out == n:
        return x
    starts = (np.arange(out) * n) // out
    ends = -((np.arange(1, out + 1) * n) // -out)  # ceil division
    widths = ends - starts
    max_w = int(widths.max())
    if n % out == 0 and (widths == n // out).all():
        # Uniform non-overlapping windows: reshape-and-reduce (no gather).
        new_shape = list(x.shape)
        new_shape[axis:axis + 1] = [out, max_w]
        return jnp.max(x.reshape(new_shape), axis=axis + 1)
    idx = starts[:, None] + np.arange(max_w)[None, :]
    valid = idx < ends[:, None]
    idx = np.minimum(idx, n - 1)
    gathered = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=axis)
    new_shape = list(x.shape)
    new_shape[axis:axis + 1] = [out, max_w]
    gathered = gathered.reshape(new_shape)
    mask_shape = [1] * gathered.ndim
    mask_shape[axis] = out
    mask_shape[axis + 1] = max_w
    mask = jnp.asarray(valid.reshape(mask_shape))
    neg_inf = jnp.asarray(-jnp.inf, dtype=x.dtype) if \
        jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    gathered = jnp.where(mask, gathered, neg_inf)
    return jnp.max(gathered, axis=axis + 1)


def adaptive_max_pool(x: jnp.ndarray, out_sizes: Sequence[int],
                      axes: Sequence[int]) -> jnp.ndarray:
    """Adaptive max pool over ``axes`` to the given output sizes."""
    for axis, out in zip(axes, out_sizes):
        x = _axis_adaptive_max(x, axis, int(out))
    return x
