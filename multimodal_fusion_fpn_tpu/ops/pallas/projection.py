"""Pallas TPU kernel: fused depth-projection head (inference).

The projection head is the paper's core op (reference
``unets3D.py:356-437`` + the ``torch.mean(dim=4)``): a cascade of
(1,1,3)-stride-2 convs with BN+ReLU, a strided 1x1 residual projection,
a (1,1,4) VALID conv, and a mean over the remaining depth.  It is a pure
along-depth pipeline per (B-scan row, en-face column), which makes it an
ideal fusion candidate: the XLA version writes every intermediate volume
to HBM; this kernel streams one (X, Z, C) tile through VMEM and writes
only the (X, 1, C) projected output.

Inference-mode batch norm is folded into the conv weights host-side
(:func:`fold_projection_params`), so the kernel sees plain
conv+bias stages.  Forward/inference only — training uses the
autodiff-friendly banded formulation (:mod:`..banded`).
"""

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(w: np.ndarray, conv_bias, scale, bias, mean, var,
            eps: float = 1e-5):
    """Fold inference BN into conv weight/bias.

    w: (..., Ci, Co); returns (w', b') with
    ``y = conv(x; w') + b' == BN(conv(x; w) + conv_bias)``.
    """
    s = scale / np.sqrt(var + eps)
    w2 = w * s  # broadcast over Co (last axis)
    b0 = conv_bias if conv_bias is not None else 0.0
    b2 = (b0 - mean) * s + bias
    return w2, b2


def fold_projection_params(params: dict, batch_stats: dict,
                           num_reductions: int):
    """Fold a ZDimReduction param tree (module ``models.blocks``) into the
    kernel's plain conv stages.

    Returns (cascade[(w3,b)], ds(w1,b) or None, final(w4,b)).
    """
    def fold_convx(p, bs, conv_name, bn_name):
        w = np.asarray(p[conv_name]["kernel"])  # (1,1,k,Ci,Co)
        w = w[0, 0]  # (k, Ci, Co)
        conv_bias = np.asarray(p[conv_name]["bias"]) \
            if "bias" in p[conv_name] else None
        return fold_bn(w, conv_bias,
                       np.asarray(p[bn_name]["scale"]),
                       np.asarray(p[bn_name]["bias"]),
                       np.asarray(bs[bn_name]["mean"]),
                       np.asarray(bs[bn_name]["var"]))

    cascade = []
    ds = None
    if num_reductions > 0:
        red_p, red_bs = params["red"], batch_stats["red"]
        for i in range(num_reductions):
            cascade.append(fold_convx(red_p, red_bs, f"conv{i}", f"bn{i}"))
        wd, bd = fold_convx(red_p, red_bs, "ds_conv", "ds_bn")
        ds = (wd[0], bd)  # (Ci, Co)
    fully_p, fully_bs = params["fully"], batch_stats["fully"]
    final = fold_convx(fully_p, fully_bs, "conv0", "bn0")
    return cascade, ds, final


def _projection_kernel(x_ref, *refs, num_reductions: int,
                       final_kernel: int):
    # refs: cascade w (k,Ci,Co) & b pairs, optional ds (w, b), final (w, b),
    # then out_ref last.
    out_ref = refs[-1]
    weight_refs = refs[:-1]
    idx = 0

    h = x_ref[0]  # (X, Z, C)
    res = h
    for i in range(num_reductions):
        w = weight_refs[idx][:]
        b = weight_refs[idx + 1][:]
        idx += 2
        zin = h.shape[1]
        zout = (zin + 2 - 3) // 2 + 1
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
        # Mosaic forbids strided vector slices; decompose the stride-2
        # conv by parity: out[j] = e[j] w0 + o[j] w1 + e[j+1] w2 where
        # e/o are the even/odd phases of the padded input.
        pairs = hp.reshape(hp.shape[0], hp.shape[1] // 2, 2, hp.shape[2])
        even = pairs[:, :, 0, :]
        odd = pairs[:, :, 1, :]
        taps = [jax.lax.slice_in_dim(even, 0, zout, axis=1),
                jax.lax.slice_in_dim(odd, 0, zout, axis=1),
                jax.lax.slice_in_dim(even, 1, zout + 1, axis=1)]
        acc = None
        for dz in range(3):
            t = jax.lax.dot_general(
                taps[dz], w[dz],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        h = acc + b
        if i < num_reductions - 1:
            h = jnp.maximum(h, 0.0)

    if num_reductions > 0:
        wd = weight_refs[idx][:]
        bd = weight_refs[idx + 1][:]
        idx += 2
        stride = 2 ** num_reductions
        # res[::stride] via a reshape (length divisible by the stride —
        # guaranteed by the RelFit multiples-of-16 shapes).
        rr = res.reshape(res.shape[0], res.shape[1] // stride, stride,
                         res.shape[2])
        rs = rr[:, :, 0, :]
        rs = jax.lax.slice_in_dim(rs, 0, h.shape[1], axis=1)
        rd = jax.lax.dot_general(
            rs, wd, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bd
        h = jnp.maximum(h + rd, 0.0)

    wf = weight_refs[idx][:]
    bf = weight_refs[idx + 1][:]
    zf = h.shape[1] - final_kernel + 1
    acc = None
    for dz in range(final_kernel):
        sl = jax.lax.slice_in_dim(h, dz, dz + zf, axis=1)
        t = jax.lax.dot_general(
            sl, wf[dz], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    h = jnp.maximum(acc + bf, 0.0)
    out_ref[0] = jnp.mean(h, axis=1, keepdims=True)


def projection_head_pallas(x: jnp.ndarray,
                           cascade: List[Tuple],
                           ds, final: Tuple,
                           x_tile: int = 16,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused projection head.  x: (B, Y, X, Z, C) → (B, Y, X, 1, C)."""
    b, y, xdim, z, c = x.shape
    num_reductions = len(cascade)
    final_kernel = final[0].shape[0]

    weights = []
    for w, bias in cascade:
        weights += [jnp.asarray(w, jnp.float32), jnp.asarray(bias,
                                                             jnp.float32)]
    if ds is not None:
        weights += [jnp.asarray(ds[0], jnp.float32),
                    jnp.asarray(ds[1], jnp.float32)]
    weights += [jnp.asarray(final[0], jnp.float32),
                jnp.asarray(final[1], jnp.float32)]

    x3 = x.reshape(b * y, xdim, z, c)
    while xdim % x_tile:
        x_tile //= 2
    n_x = xdim // x_tile

    kernel = partial(_projection_kernel, num_reductions=num_reductions,
                     final_kernel=final_kernel)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * y, xdim, 1, c), jnp.float32),
        grid=(b * y, n_x),
        in_specs=[pl.BlockSpec((1, x_tile, z, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(w.shape,
                               (lambda nd: lambda i, j: (0,) * nd)(w.ndim),
                               memory_space=pltpu.VMEM) for w in weights],
        out_specs=pl.BlockSpec((1, x_tile, 1, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x3, *weights)
    return out.reshape(b, y, xdim, 1, c)
