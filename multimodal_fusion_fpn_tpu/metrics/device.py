"""On-device per-sample metric kernels for the training/validation loops.

The reference updates its streaming metrics from GPU tensors after every
step, forcing a device→host copy of the full prediction volume
(``pl_model_wrapper.py:250-252``).  Here the per-sample values are
computed inside the jitted step on TPU and only scalars leave the device;
the host-side accumulators (:mod:`.streaming`) consume them via
``extend_values``.  Conventions match the streaming classes exactly
(hard Dice@0.5 with empty-empty→1; BCE with torch's -100 log clamp).
"""

import jax.numpy as jnp


def dice_per_sample(pred: jnp.ndarray, gt: jnp.ndarray,
                    slice_idx: int = 0, threshold: float = 0.5):
    """Hard Dice@threshold per batch element.  pred/gt: (B, C, ...)."""
    n = pred.shape[0]
    p = (pred[:, slice_idx] > threshold).astype(jnp.float32).reshape(n, -1)
    g = (gt[:, slice_idx] > threshold).astype(jnp.float32).reshape(n, -1)
    num = (p * g).sum(axis=1)
    den = (p + g).sum(axis=1)
    return jnp.where(den == 0.0, 1.0, 2.0 * num / jnp.maximum(den, 1.0))


def bce_scalar(pred: jnp.ndarray, gt: jnp.ndarray, slice_idx: int = 0):
    """Mean BCE over the batch slice (single scalar, like the reference's
    BCE metric)."""
    p = pred[:, slice_idx].reshape(-1)
    g = gt[:, slice_idx].reshape(-1).astype(p.dtype)
    log_p = jnp.clip(jnp.log(p), -100.0, None)
    log_1p = jnp.clip(jnp.log1p(-p), -100.0, None)
    return -jnp.mean(g * log_p + (1.0 - g) * log_1p)
