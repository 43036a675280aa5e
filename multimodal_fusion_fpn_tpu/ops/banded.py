"""Banded block-matmul convolution for narrow-channel convs on TPU.

Why this exists: XLA's TPU convolution lowering pins the channel dim to
the 128-wide lane dimension.  This model family (reference ini widths
16..256, ``models/fpn/*.ini``) runs its *hottest* convs at 16/32
channels over full OCT volumes, so every activation buffer is padded
16→128 (8x HBM waste) and the MXU runs at ~1/8 column occupancy — the
measured result is ~2.5 img/s on a v5e chip.

The TPU-native formulation: block the innermost long spatial axis (depth
Z for the encoder, width X for the z-collapsed decoder) into groups of
``block`` outputs and compute each group as ONE dense matmul

    P[..., nb, W*Ci] @ W2[W*Ci, block*Co]

where ``W = (block-1)*stride + k`` is the input window per block and
``W2`` is the *banded* expansion of the conv kernel (zeros off the
band), built inside the jitted function from the logical parameters so
autodiff produces correct kernel gradients with no custom VJP.  With
C=16 and block=8 the matmul is K=160 x N=128: full lane occupancy, no
layout padding anywhere, at the cost of a ~W/k logical-FLOP expansion —
a large net win over 8x-padded lax.conv.

Taps over the remaining spatial dims (B-scan index, en-face width) are
folded by summing shifted dots.  Works for any rank: the conv is over
the trailing ``w.ndim - 2`` spatial dims of a channels-last array.
"""

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _out_size(n: int, k: int, stride: int, pad: int) -> int:
    return (n + 2 * pad - k) // stride + 1


def banded_conv(x: jnp.ndarray, w: jnp.ndarray,
                strides: Sequence[int],
                padding: Sequence[Tuple[int, int] or int],
                block: int = 8,
                preferred_element_type=jnp.float32,
                packed_out: bool = False) -> jnp.ndarray:
    """Convolution over the trailing spatial dims of a channels-last array,
    blocked along the LAST spatial dim.

    Args:
        x: (B, S1..Sn, C_in) channels-last input.
        w: (k1..kn, C_in, C_out) kernel.
        strides: per-spatial-dim strides; only the last dim may be > 1.
        padding: per-spatial-dim symmetric padding (ints).
        block: outputs per matmul block along the last spatial dim.
    """
    nsp = w.ndim - 2
    assert x.ndim == nsp + 2, (x.shape, w.shape)
    ks = w.shape[:nsp]
    ci, co = w.shape[-2], w.shape[-1]
    pads = [p if isinstance(p, int) else p[0] for p in padding]
    strides = tuple(strides)
    assert all(s == 1 for s in strides[:-1]), strides
    sz = strides[-1]
    kz = ks[-1]
    pz = pads[-1]

    spatial = x.shape[1:-1]
    z = spatial[-1]
    z_out = _out_size(z, kz, sz, pz)
    block = max(1, min(block, z_out))  # tiny-z tails of the cascades
    nb = -(-z_out // block)  # ceil
    win = (block - 1) * sz + kz  # input extent per output block

    # ---- pad: outer taps (zeros) on the leading spatial dims, and on z:
    # left pad pz, right pad enough to cover the last block's window.
    z_ext_needed = max((nb - 1) * block * sz + win, nb * block * sz)
    pad_cfg = [(0, 0)]
    for d in range(nsp - 1):
        pad_cfg.append((pads[d], pads[d]))
    pad_cfg.append((pz, max(0, z_ext_needed - z - pz)))
    pad_cfg.append((0, 0))
    xp = jnp.pad(x, pad_cfg)

    # ---- patches along z: (..., nb, win, ci), built from block-shifted
    # views (window rows [i*bs + s*bs, i*bs + s*bs + take) per shift s).
    bs = block * sz
    zp = xp.shape[-2]
    new_shape = xp.shape[:-2] + (nb, bs, ci)
    parts = []
    offset = 0
    while offset < win:
        src = lax.slice_in_dim(xp, offset, min(zp, offset + nb * bs),
                               axis=-2)
        pad_rows = nb * bs - src.shape[-2]
        if pad_rows > 0:
            cfg = [(0, 0)] * src.ndim
            cfg[-2] = (0, pad_rows)
            src = jnp.pad(src, cfg)
        blocks = src.reshape(new_shape)
        take = min(bs, win - offset)
        parts.append(lax.slice_in_dim(blocks, 0, take, axis=-2))
        offset += bs
    patches = parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                               axis=-2)
    # flatten (win, ci) -> K
    patches = patches.reshape(patches.shape[:-2] + (win * ci,))

    # ---- banded weight expansion: W2[(zz, i), (j, o)] = w[..., dz, i, o]
    # where zz = j*sz + dz.  Built per leading tap (k1..k_{n-1}).
    j_idx = np.arange(block)
    lead_taps = list(np.ndindex(*ks[:-1])) if nsp > 1 else [()]

    out = None
    out_sizes = [ _out_size(spatial[d], ks[d], 1, pads[d])
                  for d in range(nsp - 1) ]
    for tap in lead_taps:
        # slice the shifted window over the leading spatial dims
        sl = patches
        for d, t in enumerate(tap):
            sl = lax.slice_in_dim(sl, t, t + out_sizes[d], axis=1 + d)
        w_tap = w[tap] if tap else w  # (kz, ci, co)
        w2 = jnp.zeros((win, ci, block, co), dtype=w.dtype)
        for dz in range(kz):
            w2 = w2.at[j_idx * sz + dz, :, j_idx, :].add(
                jnp.broadcast_to(w_tap[dz], (block, ci, co)))
        w2 = jnp.transpose(w2, (0, 1, 2, 3)).reshape(win * ci, block * co)
        t_out = lax.dot_general(
            sl, w2, dimension_numbers=(((sl.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=preferred_element_type)
        out = t_out if out is None else out + t_out

    if packed_out:
        # the dot output (..., X, nb, block*co) IS the padless thick
        # layout when z_out == nb*block: return (B, Y, X*nb, block*co)
        # without the compact round trip (the compact 5D form is 8x
        # lane-padded for narrow co, and its layout copies around the
        # Pallas stage kernels were among the largest step-HLO items).
        assert nb * block == z_out, (nb, block, z_out)
        return out.reshape(
            out.shape[:-3] + (out.shape[-3] * nb, block * co)
        ).astype(preferred_element_type)
    # (..., nb, block*co) -> (..., nb*block, co) -> slice true z_out
    out = out.reshape(out.shape[:-1] + (block, co))
    out = out.reshape(out.shape[:-3] + (nb * block, co))
    out = lax.slice_in_dim(out, 0, z_out, axis=-2)
    return out.astype(preferred_element_type)


def conv_reference(x, w, strides, padding):
    """lax.conv with the same channels-last convention (for tests)."""
    nsp = w.ndim - 2
    lhs_spec = "N" + "DHW"[3 - nsp:] + "C"
    rhs_spec = "DHW"[3 - nsp:] + "IO"
    pads = [(p, p) if isinstance(p, int) else p for p in padding]
    return lax.conv_general_dilated(
        x, w, tuple(strides), pads,
        dimension_numbers=(lhs_spec, rhs_spec, lhs_spec))


def _w2_blocked(w_tap: jnp.ndarray, block: int) -> jnp.ndarray:
    """Banded weight expansion for blocked stride-1 convs.

    w_tap: (kz, Ci, Co) with kz in {1, 3}.  For kz=3 the block window is
    [prev-tail(1), block, next-head(1)] so output j reads zz = j + dz; for
    kz=1 the window is the block itself (diagonal band).
    """
    kz, ci, co = w_tap.shape
    win = block + (2 if kz == 3 else 0)
    w2 = jnp.zeros((win, ci, block, co), dtype=w_tap.dtype)
    j = np.arange(block)
    for dz in range(kz):
        w2 = w2.at[j + dz, :, j, :].add(
            jnp.broadcast_to(w_tap[dz], (block, ci, co)))
    return w2.reshape(win * ci, block * co)


def _blocked_patches(x6: jnp.ndarray, kz: int, lead_pads) -> jnp.ndarray:
    """Blocked-z patch volume for stride-1 SAME convs with taps {1,3}.

    x6: (B, S1..Sm, nb, bs, Ci) → (B, S1..Sm(+lead pads), nb, win*Ci)
    where win = bs + 2 for kz=3 (a one-row halo from the neighboring
    blocks, zeros at the z edges) and win = bs for kz=1.
    """
    ci = x6.shape[-1]
    bs = x6.shape[-2]
    if kz == 3:
        zpad = jnp.zeros(x6.shape[:-3] + (1, 1, ci), x6.dtype)
        prev_tail = jnp.concatenate([zpad, x6[..., :-1, -1:, :]], axis=-3)
        next_head = jnp.concatenate([x6[..., 1:, :1, :], zpad], axis=-3)
        patches = jnp.concatenate([prev_tail, x6, next_head], axis=-2)
        win = bs + 2
    else:
        patches = x6
        win = bs
    patches = patches.reshape(patches.shape[:-2] + (win * ci,))
    pad_cfg = [(0, 0)] + [(p, p) for p in lead_pads] + [(0, 0), (0, 0)]
    return jnp.pad(patches, pad_cfg)


_PALLAS_MODE = "off"  # "on" | "off" | "auto" — off until the kernel beats XLA (PERF.md)


def set_pallas_blocked(mode: str) -> None:
    """Select the blocked-conv lowering: 'on' (Pallas kernel), 'off'
    (XLA banded dots), 'auto' (Pallas unless the default backend is CPU
    — the kernel targets real TPU tiling; tests and the CPU-mesh dryrun
    use the XLA path)."""
    global _PALLAS_MODE
    assert mode in ("on", "off", "auto"), mode
    _PALLAS_MODE = mode


def _use_pallas_blocked(w) -> bool:
    if _PALLAS_MODE == "off":
        return False
    if _PALLAS_MODE == "auto" and jax.default_backend() == "cpu":
        return False
    # kernel supports 1-2 lead dims, all taps in {1, 3}
    return w.ndim in (4, 5) and all(k in (1, 3) for k in w.shape[:-2])


def _dispatch_blocked(x6, w, preferred_element_type):
    if _use_pallas_blocked(w):
        from multimodal_fusion_fpn_tpu.ops.pallas.banded_conv import (
            banded_conv_blocked_pallas, w2_band, w2_wrap)
        bs = x6.shape[-2]
        kz = w.shape[-3]
        k_lead = w.shape[:-3]
        taps = ([w[t] for t in np.ndindex(*k_lead)] if k_lead else [w])
        band = jnp.stack([w2_band(t, bs) for t in taps])
        if kz == 3:
            wrap = jnp.stack([w2_wrap(t, bs) for t in taps])
        else:
            wrap = jnp.zeros_like(band)
        return banded_conv_blocked_pallas(
            x6, band, wrap, k_lead or (1,), kz,
            preferred_element_type=preferred_element_type)
    return _banded_conv_blocked_impl(x6, w, preferred_element_type)


def _banded_conv_blocked_impl(x6, w, preferred_element_type):
    n_lead = w.ndim - 3
    lead_sizes = x6.shape[1:1 + n_lead]
    bs = x6.shape[-2]
    k_lead = w.shape[:n_lead]
    kz, co = w.shape[-3], w.shape[-1]

    pp = _blocked_patches(x6, kz, [k // 2 for k in k_lead])
    out = None
    for tap in (np.ndindex(*k_lead) if n_lead else [()]):
        sl = pp
        for d, t in enumerate(tap):
            sl = lax.slice_in_dim(sl, t, t + lead_sizes[d], axis=1 + d)
        t_out = lax.dot_general(
            sl, _w2_blocked(w[tap] if tap else w, bs),
            dimension_numbers=(((sl.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=preferred_element_type)
        out = t_out if out is None else out + t_out
    return out.reshape(out.shape[:-1] + (bs, co)).astype(
        preferred_element_type)


def _thick_conv_blocked_kz1(x6, w, preferred_element_type):
    """z-pointwise (kz=1) blocked conv as ONE standard XLA conv on the
    thick layout: channels = bs*Ci -> bs*Co with a block-diagonal weight
    expansion.  At the model widths bs*C = 128: full lane occupancy, the
    native conv emitter handles MXU tiling, and the backward is itself a
    conv — measured ~2x faster fwd+bwd than the patch dots for the
    (3,1,1) across-B-scan convs (tools/bench_thick.py, PERF.md round 2).

    The 8x FLOP expansion of the block-diagonal dense matmul trades even
    against the narrow conv's 1/8 MXU column occupancy, and avoids every
    padded narrow-channel buffer.
    """
    n_lead = w.ndim - 3
    k_lead = w.shape[:n_lead]
    ci, co = w.shape[-2], w.shape[-1]
    nb, bs = x6.shape[-3], x6.shape[-2]

    xt = x6.reshape(x6.shape[:-2] + (bs * ci,))
    # wb[(j, i), (j, o)] = w[..., 0, i, o] — block-diagonal over j.
    eye = jnp.asarray(np.eye(bs, dtype=np.float32), w.dtype)
    wb = jnp.einsum("...io,jk->...jiko", w[..., 0, :, :], eye)
    wb = wb.reshape(k_lead + (1, bs * ci, bs * co))

    nsp = n_lead + 1  # lead dims + nb (kernel 1 over nb)
    lhs_spec = "N" + "DHW"[3 - nsp:] + "C"
    rhs_spec = "DHW"[3 - nsp:] + "IO"
    pads = [(k // 2, k // 2) for k in k_lead] + [(0, 0)]
    out = lax.conv_general_dilated(
        xt, wb, (1,) * nsp, pads,
        dimension_numbers=(lhs_spec, rhs_spec, lhs_spec),
        preferred_element_type=preferred_element_type)
    return out.reshape(out.shape[:-1] + (bs, co)).astype(
        preferred_element_type)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _banded_conv_blocked(x6, w, preferred_element_type):
    return _dispatch_blocked(x6, w, preferred_element_type)


def _bcb_fwd(x6, w, preferred_element_type):
    # Residuals are just the natural inputs — the win/bs-expanded patch
    # temp autodiff would otherwise save is recomputed in the backward.
    return _dispatch_blocked(x6, w, preferred_element_type), (x6, w)


def _bcb_bwd(preferred_element_type, res, g):
    x6, w = res
    n_lead = w.ndim - 3
    lead_sizes = x6.shape[1:1 + n_lead]
    bs, ci = x6.shape[-2], x6.shape[-1]
    k_lead = w.shape[:n_lead]
    kz, co = w.shape[-3], w.shape[-1]
    g = g.astype(x6.dtype)

    # dx: stride-1 SAME conv of g with the spatially-flipped, channel-
    # transposed kernel — itself a banded blocked conv.
    w_flip = jnp.flip(w, axis=tuple(range(w.ndim - 2)))
    w_flip = jnp.swapaxes(w_flip, -1, -2)
    dx = _dispatch_blocked(g, w_flip, preferred_element_type)
    dx = dx.astype(x6.dtype)

    # dw: contract the (recomputed) patch volume against g over every
    # position, then collapse the band.  band_mask[zz, j, dz] = 1 iff the
    # patch row zz feeds output j through kernel tap dz (zz = j + dz for
    # kz=3 — the window is [prev, block, next] so dz offsets directly;
    # zz = j for kz=1).
    pp = _blocked_patches(x6, kz, [k // 2 for k in k_lead])
    g2 = g.reshape(g.shape[:-2] + (bs * co,))
    win = bs + 2 if kz == 3 else bs
    band = np.zeros((win, bs, kz), dtype=np.float32)
    for dz in range(kz):
        for j in range(bs):
            band[j + dz if kz == 3 else j, j, dz] = 1.0
    band = jnp.asarray(band, x6.dtype)

    contract = tuple(range(g2.ndim - 1))
    dw_taps = []
    for tap in (np.ndindex(*k_lead) if n_lead else [()]):
        sl = pp
        for d, t in enumerate(tap):
            sl = lax.slice_in_dim(sl, t, t + lead_sizes[d], axis=1 + d)
        # (win*ci, bs*co) <- sum over batch/spatial/nb positions
        dw2 = lax.dot_general(
            sl, g2,
            dimension_numbers=((contract, contract), ((), ())),
            preferred_element_type=jnp.promote_types(sl.dtype,
                                                     jnp.float32))
        dw2 = dw2.reshape(win, ci, bs, co)
        # dw[dz, i, o] = sum_{zz,j} dw2[zz, i, j, o] * band[zz, j, dz]
        dw_taps.append(jnp.einsum("zijo,zjd->dio", dw2,
                                  band.astype(dw2.dtype)))
    if n_lead:
        dw = jnp.stack(dw_taps).reshape(k_lead + dw_taps[0].shape)
    else:
        dw = dw_taps[0]
    return dx, dw.astype(w.dtype)


_banded_conv_blocked.defvjp(_bcb_fwd, _bcb_bwd)


def banded_conv_blocked(x6: jnp.ndarray, w: jnp.ndarray,
                        preferred_element_type=jnp.float32) -> jnp.ndarray:
    """Stride-1 conv on BLOCKED activations — input and output stay in the
    blocked form, so no (.., Z, C) intermediate is ever materialized
    (the layout XLA pads 8x for narrow channels).

    x6: (B, S1..Sm, nb, bs, Ci) — the innermost spatial axis is blocked
        into nb blocks of bs with no tail padding; S1..Sm are the other
        spatial dims.
    w:  (k1..km, kz, Ci, Co), every tap in {1, 3}, SAME padding
        (k//2 per dim).  Returns (B, S1..Sm, nb, bs, Co).

    Ships with a custom VJP: the backward recomputes the patch volume
    from the saved input (instead of keeping the expanded temp alive
    across the whole step) and computes dx as the flipped banded conv and
    dw as one banded contraction per lead tap — both full-lane matmuls.

    NOTE: :func:`_thick_conv_blocked_kz1` (kz=1 as one standard XLA conv
    on the thick layout) wins ~2x on the standalone microbench
    (tools/bench_thick.py) but REGRESSES the full model ~6x and OOMs the
    train step — XLA inserts 256MB layout copies around the 5D convs
    when they are surrounded by the banded dots.  Kept opt-out until the
    layout interaction is understood (PERF.md round 2).
    """
    return _banded_conv_blocked(x6, w, preferred_element_type)
