"""TRUE-extent-aware ops inside padded buffers (exact shape bucketing).

Groundwork for bucketed whole-volume evaluation that is EXACT instead
of approximate (round-2 verdict #6): the padded graph is compiled once
per bucket, but the real extents travel as dynamic scalars, so the
size-dependent ops — adaptive max pooling, linear resize, the
nearest-upsample index alignment, masked means — compute over the TRUE
extents with dynamic index arithmetic.  Each function here is the
dynamic twin of a static op in ``ops/pooling.py`` / ``ops/interpolate.py``
/ ``ops/upsample.py`` and is tested for bit-equality against it on the
valid region (tests/test_dynamic_extent.py).

Conventions: ``n_true``/``m_true`` are int32 scalars (dynamic) bounded
by the padded (static) extents; data beyond a true extent must be
ZERO (masked by the caller — ``mask_valid``) for the max-type ops'
neutral handling to hold.
"""

from typing import Sequence

import jax
import jax.numpy as jnp


def mask_valid(x: jnp.ndarray, extents) -> jnp.ndarray:
    """Zero everything beyond the true extents.

    ``extents``: dict {axis: true_extent_scalar}."""
    mask = None
    for axis, t in extents.items():
        if t is None:
            continue
        shape = [1] * x.ndim
        shape[axis] = x.shape[axis]
        idx = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
        m = idx < jnp.asarray(t, jnp.int32)
        mask = m if mask is None else jnp.logical_and(mask, m)
    if mask is None:
        return x
    return jnp.where(mask, x, jnp.zeros((), x.dtype))


def masked_mean(x: jnp.ndarray, axis: int, n_true) -> jnp.ndarray:
    """Mean over the first ``n_true`` entries of ``axis`` (entries
    beyond must already be zero)."""
    s = jnp.sum(x, axis=axis, keepdims=True)
    return s / jnp.asarray(n_true, x.dtype)


def _axis_adaptive_max_dynamic(x: jnp.ndarray, axis: int,
                               n_true, m_true, max_ratio: int,
                               m_pad: int = None):
    """torch adaptive_max_pool along one axis with DYNAMIC true
    input/output extents inside padded buffers.

    Output cell i < m_true maxes over [floor(i*n/m), ceil((i+1)*n/m))
    of the TRUE extent; cells i >= m_true are zero.  ``max_ratio``
    bounds ceil(n_true/m_true) (static gather width); ``m_pad`` is the
    padded OUTPUT extent (defaults to the input's)."""
    n_pad = x.shape[axis]
    if m_pad is None:
        m_pad = x.shape[axis]
    n = jnp.asarray(n_true, jnp.int32)
    m = jnp.asarray(m_true, jnp.int32)
    W = max_ratio + 1
    i = jnp.arange(m_pad, dtype=jnp.int32)
    starts = (i * n) // jnp.maximum(m, 1)
    ends = -((-(i + 1) * n) // jnp.maximum(m, 1))  # ceil
    idx = starts[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = jnp.logical_and(idx < ends[:, None],
                            (i < m)[:, None])
    idx_c = jnp.clip(idx, 0, n_pad - 1)
    gathered = jnp.take(x, idx_c.reshape(-1), axis=axis)
    new_shape = list(x.shape)
    new_shape[axis:axis + 1] = [m_pad, W]
    gathered = gathered.reshape(new_shape)
    mask_shape = [1] * gathered.ndim
    mask_shape[axis] = m_pad
    mask_shape[axis + 1] = W
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    gathered = jnp.where(valid.reshape(mask_shape), gathered, neg_inf)
    out = jnp.max(gathered, axis=axis + 1)
    # zero the cells beyond m_true (keep the buffer mask invariant)
    zero_shape = [1] * out.ndim
    zero_shape[axis] = m_pad
    cell = jax.lax.broadcasted_iota(jnp.int32, tuple(zero_shape), axis)
    return jnp.where(cell < m, out, jnp.zeros((), x.dtype))


def adaptive_max_pool_dynamic(x: jnp.ndarray, true_in, true_out,
                              axes: Sequence[int],
                              max_ratio: int = 8,
                              out_pads: Sequence[int] = None
                              ) -> jnp.ndarray:
    """Dynamic-extent twin of ``ops.pooling.adaptive_max_pool``: the
    output lives in padded buffers (``out_pads`` per axis, default the
    input's), valid in ``true_out``, zero beyond."""
    out_pads = out_pads or [None] * len(axes)
    for axis, n_t, m_t, mp in zip(axes, true_in, true_out, out_pads):
        if n_t is None:
            continue
        x = _axis_adaptive_max_dynamic(x, axis, n_t, m_t, max_ratio, mp)
    return x


def _axis_linear_dynamic(x: jnp.ndarray, axis: int, n_true, m_true,
                         m_pad: int = None):
    """torch align_corners=False linear resize along one axis with
    dynamic true extents inside padded buffers."""
    n_pad = x.shape[axis]
    if m_pad is None:
        m_pad = x.shape[axis]
    # coords = (i + 0.5) * n/m - 0.5 = ((2i+1)*n - m) / (2m): keep the
    # numerator INTEGER so floor and the lerp weight are exact (a
    # float32 n/m ratio drifts the boundary floors vs the static op).
    n_i = jnp.asarray(n_true, jnp.int32)
    m_i = jnp.maximum(jnp.asarray(m_true, jnp.int32), 1)
    i = jnp.arange(m_pad, dtype=jnp.int32)
    num = (2 * i + 1) * n_i - m_i
    den = 2 * m_i
    lo_i = jnp.floor_divide(num, den)
    w = ((num - lo_i * den).astype(jnp.float32)
         / den.astype(jnp.float32)).astype(x.dtype)
    lo_c = jnp.clip(lo_i, 0, n_i - 1)
    hi_c = jnp.clip(lo_i + 1, 0, n_i - 1)
    shape = [1] * x.ndim
    shape[axis] = m_pad
    w = w.reshape(shape)
    x_lo = jnp.take(x, lo_c, axis=axis)
    x_hi = jnp.take(x, hi_c, axis=axis)
    out = x_lo * (1 - w) + x_hi * w
    cell = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
    return jnp.where(cell < jnp.asarray(m_true, jnp.int32), out,
                     jnp.zeros((), x.dtype))


def linear_resize_dynamic(x: jnp.ndarray, true_in, true_out,
                          axes: Sequence[int],
                          out_pads: Sequence[int] = None) -> jnp.ndarray:
    """Dynamic-extent twin of ``ops.interpolate.linear_resize``."""
    out_pads = out_pads or [None] * len(axes)
    for axis, n_t, m_t, mp in zip(axes, true_in, true_out, out_pads):
        if n_t is None:
            continue
        x = _axis_linear_dynamic(x, axis, n_t, m_t, mp)
    return x


def upsample_nearest_indices_dynamic(n_in_true, n_out_true,
                                     n_out_pad: int):
    """The index-gather NN-upsample map with dynamic extents: the
    reference's ceil alignment — output i (0-based) gathers
    ``ceil((i+1) * n_in / n_out) - 1`` (ops/upsample.py twin, with
    scale = n_out/n_in).  Returns (n_out_pad,) int32 indices clamped
    into the true input extent; positions >= n_out_true map to 0."""
    i = jnp.arange(n_out_pad, dtype=jnp.int32)
    n_in = jnp.asarray(n_in_true, jnp.int32)
    n_out = jnp.asarray(n_out_true, jnp.int32)
    den = jnp.maximum(n_out, 1)
    src = ((i + 1) * n_in + den - 1) // den - 1
    src = jnp.clip(src, 0, n_in - 1)
    return jnp.where(i < n_out, src, 0)
