"""Pallas TPU kernel for the blocked banded convolution.

This is the fused-ConvX groundwork (PERF.md roadmap #2): the XLA lowering
of :func:`..banded.banded_conv_blocked` materializes the win/bs-expanded
patch volume in HBM (650 MB per stage-1 conv at the flagship shapes) and
round-trips every intermediate; this kernel reads each input slab into
VMEM once and writes the conv output once — HBM traffic is exactly
read + write.

Data model:
  * activations are z-blocked, flattened to rows:  x2[(b, y, x, nb), bs*ci]
    — the minor dim is bs*ci (a multiple of 128 at every model width), so
    the canonical row-major layout is lane-dense (no narrow-channel
    padding anywhere).
  * z-taps are folded into TWO 128-aligned matmuls per lead tap instead
    of the (win*ci)-column patch concat (Mosaic cannot lower lane-dim
    concats at non-tile offsets):
      - a *band* matrix  W2b[(zi, i), (j, o)] = w[j - zi + 1, i, o]
        covering every in-block tap, and
      - a *wrap* matrix holding the two cross-block taps; its output is
        row-rolled (block m's tail contribution lands in block m+1's
        head columns and vice versa) and masked at the volume edges.
  * grid = (B, Y, X/Tx).  Each step DMAs kY row-slabs (the x-window plus
    kX//2 halo columns, from a host-side padded copy) and accumulates
    2 (or 1, for kz=1) dots per (dy, dx) tap into the output block.

Kernel-tap support is what the model family uses (reference
``models/fpn/unets3D.py:187-219``): every tap in {1, 3}, stride 1, SAME.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def w2_band(w_tap: jnp.ndarray, bs: int) -> jnp.ndarray:
    """In-block banded weight matrix (bs*Ci, bs*Co) for taps kz in {1,3}."""
    kz, ci, co = w_tap.shape
    m = jnp.zeros((bs, ci, bs, co), dtype=w_tap.dtype)
    for dz in range(kz):
        # y[q] += x[q + dz - c] w[dz]  =>  input row p feeds q = p - off
        off = dz - (kz // 2)
        p = np.arange(max(0, off), bs + min(0, off))
        m = m.at[p, :, p - off, :].add(
            jnp.broadcast_to(w_tap[dz], (len(p), ci, co)))
    return m.reshape(bs * ci, bs * co)


def w2_wrap(w_tap: jnp.ndarray, bs: int) -> jnp.ndarray:
    """Cross-block taps: row (bs-1, i) -> head cols (0, o) with w[0]
    (consumed by the NEXT block via a +1 row roll), row (0, i) -> tail
    cols (bs-1, o) with w[2] (consumed by the PREVIOUS block)."""
    kz, ci, co = w_tap.shape
    assert kz == 3
    m = jnp.zeros((bs, ci, bs, co), dtype=w_tap.dtype)
    m = m.at[bs - 1, :, 0, :].add(w_tap[0])
    m = m.at[0, :, bs - 1, :].add(w_tap[2])
    return m.reshape(bs * ci, bs * co)


def _kernel(xp_ref, band_ref, wrap_ref, out_ref, slab, sems, *,
            ky: int, kx: int, kz: int, nb: int, nbp: int, bs: int,
            ci: int, co: int, tx: int, acc_dtype):
    """One grid step: output rows for (b, y, x-tile) = (Tx*nbp, bs*co).

    Input slabs are double-buffered across grid steps: each step starts
    the next step's DMAs before computing on its own (already in-flight)
    slabs, so the HBM read overlaps the dots.
    """
    b = pl.program_id(0)
    y = pl.program_id(1)
    xt = pl.program_id(2)
    n_y = pl.num_programs(1)
    n_xt = pl.num_programs(2)
    step = (b * n_y + y) * n_xt + xt
    n_steps = pl.num_programs(0) * n_y * n_xt

    rows_slab = (tx + (kx - 1)) * nbp
    rows_out = tx * nbp
    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    def dma(dy, bb, yy, xxt, sl):
        return pltpu.make_async_copy(
            xp_ref.at[bb, yy + dy, pl.ds(xxt * tx * nbp, rows_slab), :],
            slab.at[sl, dy], sems.at[sl, dy])

    @pl.when(step == 0)
    def _():
        for dy in range(ky):
            dma(dy, b, y, xt, slot).start()

    # prefetch next step's slabs
    nxt = step + 1
    nxt_xt = jax.lax.rem(nxt, n_xt)
    nxt_y = jax.lax.rem(nxt // n_xt, n_y)
    nxt_b = nxt // (n_xt * n_y)

    @pl.when(nxt < n_steps)
    def _():
        for dy in range(ky):
            dma(dy, nxt_b, nxt_y, nxt_xt, nslot).start()

    if kz == 3:
        # row r holds z-block j = r % nbp; cross-block adds are masked
        # at the volume edges (j == 0 has no previous block, j == nb-1
        # no next; blocks >= nb are padding, sliced off by the caller).
        j_of_row = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (rows_out, 1), 0), nbp)
        col = jax.lax.broadcasted_iota(jnp.int32, (rows_out, bs * co), 1)
        head_mask = jnp.logical_and(col < co, j_of_row != 0)
        tail_mask = jnp.logical_and(col >= (bs - 1) * co,
                                    j_of_row != nb - 1)

    acc = jnp.zeros((rows_out, bs * co), acc_dtype)
    for dy in range(ky):
        dma(dy, b, y, xt, slot).wait()
        s = slab[slot, dy]
        for dx in range(kx):
            lo = dx * nbp
            rows = s[lo:lo + rows_out]
            tap = dy * kx + dx
            acc = acc + jax.lax.dot_general(
                rows, band_ref[tap],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
            if kz == 3:
                p = jax.lax.dot_general(
                    rows, wrap_ref[tap],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype)
                # p[r, :co] is row r's tail contribution to row r+1's
                # head; p[r, (bs-1)*co:] is row r's head contribution to
                # row r-1's tail.
                head = pltpu.roll(p, 1, 0)  # mosaic-roll-ok: p is acc_dtype=fp32
                tail = pltpu.roll(p, rows_out - 1, 0)  # mosaic-roll-ok: fp32
                acc = acc + jnp.where(head_mask, head, 0)
                acc = acc + jnp.where(tail_mask, tail, 0)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _pick_tx(x: int, nb: int, bs: int, ci: int, co: int, kx: int, ky: int,
             bytes_per: int, budget: int = 28 * 2 ** 20) -> int:
    """Largest divisor tile of X fitting slabs + accumulator in VMEM."""
    for tx in sorted({d for d in range(1, x + 1) if x % d == 0},
                     reverse=True):
        slab = 2 * ky * (tx + kx - 1) * nb * bs * ci * bytes_per
        out = 2 * tx * nb * bs * co * 4
        if slab + out <= budget:
            return tx
    return 1


def banded_conv_blocked_pallas(x6: jnp.ndarray, band: jnp.ndarray,
                               wrap: jnp.ndarray,
                               kernel_hw: Tuple[int, ...], kz: int,
                               preferred_element_type=jnp.float32,
                               interpret: bool = False) -> jnp.ndarray:
    """Blocked banded conv via the Pallas kernel.

    x6:   (B, S1.., nb, bs, Ci) — 1 or 2 lead spatial dims; 2D inputs map
          the single lead dim onto the kernel's X role (kY=1).
    band: (n_lead_taps, bs*Ci, bs*Co) in-block banded weights.
    wrap: same shape, cross-block taps (ignored when kz == 1).
    kernel_hw: the lead-dim taps, each in {1, 3}.
    """
    n_lead = len(kernel_hw)
    assert x6.ndim == n_lead + 4, (x6.shape, kernel_hw)
    nb, bs, ci = x6.shape[-3], x6.shape[-2], x6.shape[-1]
    co = band.shape[-1] // bs
    assert band.shape == (int(np.prod(kernel_hw)), bs * ci, bs * co), (
        band.shape, kernel_hw, bs, ci, co)

    if n_lead == 1:
        B, X = x6.shape[0], x6.shape[1]
        Y, ky, kx = 1, 1, kernel_hw[0]
        x5 = x6.reshape(B, 1, X, nb, bs * ci)
        out_lead = (B, X)
    else:
        B, Y, X = x6.shape[0], x6.shape[1], x6.shape[2]
        ky, kx = kernel_hw
        x5 = x6.reshape(B, Y, X, nb, bs * ci)
        out_lead = (B, Y, X)

    # DMA slices must be 8-sublane aligned: pad nb to a multiple of 8.
    # The zero blocks are inert through the band/wrap math (their inputs
    # and wrap contributions are zeros) and are sliced off at the end.
    nbp = -(-nb // 8) * 8
    py, px = ky // 2, kx // 2
    xp = jnp.pad(x5, [(0, 0), (py, py), (px, px), (0, nbp - nb), (0, 0)])
    xp = xp.reshape(B, Y + 2 * py, (X + 2 * px) * nbp, bs * ci)

    bytes_per = 2 if x6.dtype == jnp.bfloat16 else 4
    tx = _pick_tx(X, nbp, bs, ci, co, kx, ky, bytes_per)
    n_xt = X // tx
    rows_slab = (tx + (kx - 1)) * nbp

    # MXU accumulation is always fp32 (bf16 accumulate is rejected by
    # Mosaic); outputs are cast at the block write.
    kern = functools.partial(
        _kernel, ky=ky, kx=kx, kz=kz, nb=nb, nbp=nbp, bs=bs, ci=ci, co=co,
        tx=tx, acc_dtype=jnp.float32)

    n_taps = band.shape[0]
    out = pl.pallas_call(
        kern,
        grid=(B, Y, n_xt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((n_taps, bs * ci, bs * co),
                         lambda b, y, x: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_taps, bs * ci, bs * co),
                         lambda b, y, x: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tx * nbp, bs * co),
            lambda b, y, x: (b, y, x, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Y, n_xt * tx * nbp, bs * co),
                                       preferred_element_type),
        scratch_shapes=[
            pltpu.VMEM((2, ky, rows_slab, bs * ci), x6.dtype),
            pltpu.SemaphoreType.DMA((2, ky)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(xp, band, wrap)

    out = out.reshape(out_lead + (nbp, bs, co))
    if nbp != nb:
        out = out[..., :nb, :, :]
    return out
