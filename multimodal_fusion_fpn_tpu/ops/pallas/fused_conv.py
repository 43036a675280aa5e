"""Fused affine+ReLU+banded-conv for the ConvX encoder chains.

The hot loop of the model family is chains of narrow-channel stride-1
SAME convs with BN+ReLU between them (reference
``models/fpn/unets3D.py:187-219``, ``fusion3D2D.py:499-581``).  The XLA
banded lowering (:mod:`..banded`) materializes a patch volume and a
separate buffer per elementwise pass; this module computes

    y_raw = bandconv( relu( sum_i x_i * s_i + b_i ), w )

as ONE Pallas kernel invocation per conv: each input slab is read once
into VMEM, the affine (folded BatchNorm), ReLU, residual-add and all
banded dots happen on-chip, and only the raw conv output is written.
BatchNorm statistics and their autodiff stay in XLA-land: the caller
computes per-channel mean/var of ``y_raw`` (one fused reduction read)
and folds them into the next conv's ``(s, b)``.

Layout — PADLESS "thick rows" carried BETWEEN kernels (round 3: the
pad rows were dropped; pack/unpack are now free reshape views and the
kernels carry the boundary logic in per-tap row masks):

    xp: (B, Y, RX, C)   with  RX = X * nb,  C = bs * ci
        rows ordered (x, m): row r = x * nb + m holds z-block m of
        en-face column x.  The X-neighbor offset is a uniform ±nb; a
        roll by ±nb wraps real rows from the opposite X edge, so each
        X tap masks its boundary group (first/last nb rows).

The z (innermost, blocked) taps use a band+wrap decomposition: `band`
holds the in-block taps as a (bs*ci, bs*co) banded matrix, `wplus` /
`wminus` the two cross-block taps, applied by rolling the dot output one
row and masking the block edges.  Row rolls commute with row-wise dots,
so the identical kernel form implements the transposed conv of the
backward pass with flipped/transposed weights (:func:`_flip_tr`).

Supported kernels: every tap in {1, 3}, stride 1, SAME — the (1,3,3),
(3,1,1) and 1x1x1 convs of the 3D encoder stages.
"""

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# Layout adapters
# --------------------------------------------------------------------------

def pack(x: jnp.ndarray, bs: int) -> jnp.ndarray:
    """(B, Y, X, Z, C) -> PADLESS thick rows (B, Y, X*nb, bs*C).

    Round 3: the layout dropped its pad rows (X-halo + nb->8 rounding).
    With rows = X*nb the X-neighbor offset is a uniform ±nb, boundary
    correctness moves from zero pads into per-tap row masks inside the
    kernels, and pack/unpack become FREE reshape views — the padded
    layout paid 2.8/7.1 ms per XLA pack/unpack copy (plus the same in
    every VJP) at stage-1 sizes, ~20 ms/step in all."""
    B, Y, X, Z, C = x.shape
    nb = Z // bs
    assert nb * bs == Z, (Z, bs)
    return x.reshape(B, Y, X * nb, bs * C)


def unpack(xp: jnp.ndarray, X: int, nb: int, bs: int) -> jnp.ndarray:
    """Inverse of :func:`pack` -> (B, Y, X, Z, C) (a free reshape)."""
    B, Y, RX, CC = xp.shape
    co = CC // bs
    return xp.reshape(B, Y, X, nb * bs, co)


def _band_wrap_matrices(w: jnp.ndarray, bs: int):
    """Per-lead-tap weight matrices for the thick layout.

    w: (kY, kX, kz, ci, co) ->
      band:   (kY*kX, bs*ci, bs*co)  in-block z taps
      wplus:  row (bs-1, i) -> col (0, o) with w[..., 0, :, :]
              (the contribution of block m's tail to block m+1's head)
      wminus: row (0, i) -> col (bs-1, o) with w[..., 2, :, :]
    wplus/wminus are None for kz == 1.
    """
    kY, kX, kz, ci, co = w.shape
    wt = w.reshape(kY * kX, kz, ci, co)
    sel = np.zeros((kz, bs, bs), np.float32)
    for dz in range(kz):
        off = dz - kz // 2
        for j in range(bs):
            if 0 <= j + off < bs:
                sel[dz, j + off, j] = 1.0
    band = jnp.einsum("tdio,djk->tjiko", wt, jnp.asarray(sel, w.dtype))
    band = band.reshape(kY * kX, bs * ci, bs * co)
    if kz == 1:
        return band, None, None
    zp = np.zeros((bs, bs), np.float32)
    zp[bs - 1, 0] = 1.0
    zm = np.zeros((bs, bs), np.float32)
    zm[0, bs - 1] = 1.0
    wplus = jnp.einsum("tio,jk->tjiko", wt[:, 0],
                       jnp.asarray(zp, w.dtype)).reshape(band.shape)
    wminus = jnp.einsum("tio,jk->tjiko", wt[:, 2],
                        jnp.asarray(zm, w.dtype)).reshape(band.shape)
    return band, wplus, wminus


def _flip_tr(w: jnp.ndarray) -> jnp.ndarray:
    """Spatially flipped, channel-transposed kernel (the SAME-conv
    transpose): (kY, kX, kz, ci, co) -> (kY, kX, kz, co, ci)."""
    return jnp.swapaxes(jnp.flip(w, axis=(0, 1, 2)), -1, -2)


def _np_masks(RX: int, X: int, nb: int):
    """Row masks for the padless layout (row r = x*nb + m).

    head/tail: rows that receive the z-wrap roll(+1)/roll(-1)
    contributions (m != 0 / m != nb-1 — a roll crossing an X-group
    boundary is never valid).  maskL/maskR: rows whose x-1 / x+1
    neighbor exists (the first/last nb rows are the x boundaries)."""
    r = np.arange(RX)
    m = r % nb
    head = m != 0
    tail = m != nb - 1
    maskL = r >= nb
    maskR = r < RX - nb
    return head, tail, maskL, maskR


# --------------------------------------------------------------------------
# Reference (XLA) implementation — also the CPU/test path
# --------------------------------------------------------------------------

def _affine_t(xs, scales, biases, relu):
    t = None
    for x, s, b in zip(xs, scales, biases):
        term = x if s is None else x * s.astype(x.dtype)
        if b is not None:
            term = term + b.astype(x.dtype)
        t = term if t is None else t + term
    if relu:
        t = jnp.maximum(t, 0.0)
    return t


def dyn_valid_mask(X: int, nb: int, bs: int, ci: int, dyn_extents,
                   with_y: int = 0, valid_in: int = 0):
    """(RX, bs*ci) validity of a padless thick buffer under dynamic
    true extents (yt, xt, zt); with ``with_y`` also returns the
    (with_y,) y-axis mask.  ``valid_in``: live slots per block for
    slot-sparse (strided-cascade) buffers, logical z = m*valid_in + j
    (0 = dense)."""
    yt, xt, zt = dyn_extents
    vi = valid_in or bs
    RX = X * nb
    rows = jnp.arange(RX, dtype=jnp.int32)[:, None]
    lane = jnp.arange(bs * ci, dtype=jnp.int32)[None, :]
    j = lane // ci
    zlog = jax.lax.rem(rows, nb) * vi + j
    valid = jnp.logical_and(
        jnp.logical_and(rows // nb < jnp.asarray(xt, jnp.int32),
                        zlog < jnp.asarray(zt, jnp.int32)),
        j < vi)
    if with_y:
        ym = (jnp.arange(with_y, dtype=jnp.int32)
              < jnp.asarray(yt, jnp.int32))
        return valid, ym
    return valid


def mask_packed_dyn(v: jnp.ndarray, X: int, nb: int, bs: int,
                    dyn_extents) -> jnp.ndarray:
    """Zero a packed thick buffer (B, Y, RX, bs*C) beyond the true
    (yt, xt, zt) extents — the packed-layout twin of
    blocks.mask_to_valid, used by the fused eval path's stage
    epilogues."""
    B, Y, RX, CC = v.shape
    valid, ym = dyn_valid_mask(X, nb, bs, CC // bs, dyn_extents,
                               with_y=Y)
    m = jnp.logical_and(valid[None, None], ym[None, :, None, None])
    return jnp.where(m, v, jnp.zeros((), v.dtype))


def _fused_conv_ref_mats(xs, scales, biases, band, wplus, wminus,
                         kY: int, kX: int, X: int, nb: int, bs: int,
                         relu: bool, preferred_element_type,
                         dyn_extents=None, dyn_valid_in: int = 0):
    """Pure-XLA fused conv on band/wrap matrices (the autodiff-closed
    form used by the custom-VJP boundary and on CPU)."""
    B, Y, RX, CC = xs[0].shape
    head, tail, maskL, maskR = _np_masks(RX, X, nb)
    to = lambda a: jnp.asarray(a[:, None], jnp.float32)
    head_m, tail_m = to(head), to(tail)
    # per-tap X-boundary validity of the rolled source rows (the padded
    # layout got this for free from zero pad rows)
    tap_m = {0: to(maskL), 1: None, 2: to(maskR)}

    t = _affine_t(xs, scales, biases, relu)
    if dyn_extents is not None:
        valid, ym = dyn_valid_mask(X, nb, bs, CC // bs, dyn_extents,
                                   with_y=Y, valid_in=dyn_valid_in)
        m = jnp.logical_and(valid[None, None], ym[None, :, None, None])
        t = jnp.where(m, t, jnp.zeros((), t.dtype))
    py = kY // 2
    tp = jnp.pad(t, [(0, 0), (py, py), (0, 0), (0, 0)])

    out = None
    for dy in range(kY):
        rows_y = lax.slice_in_dim(tp, dy, dy + Y, axis=1)
        for dx in range(kX):
            tap = dy * kX + dx
            # out row r reads t row r + (dx-1)*nb
            rows = jnp.roll(rows_y, (1 - dx) * nb, axis=2) \
                if kX == 3 else rows_y
            acc = lax.dot_general(
                rows, band[tap],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if wplus is not None:
                p = lax.dot_general(
                    rows, wplus[tap],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.roll(p, 1, axis=2) * head_m
                q = lax.dot_general(
                    rows, wminus[tap],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + jnp.roll(q, -1, axis=2) * tail_m
            if kX == 3 and tap_m[dx] is not None:
                # the band term and the wraps share one source x-group
                acc = acc * tap_m[dx]
            out = acc if out is None else out + acc
    return out.astype(preferred_element_type)


def fused_conv_ref(xs: Sequence[jnp.ndarray], scales, biases,
                   w: jnp.ndarray, X: int, nb: int, bs: int,
                   relu: bool = True,
                   preferred_element_type=jnp.float32) -> jnp.ndarray:
    """Pure-XLA reference of the fused op on the thick layout.

    xs: 1-2 arrays (B, Y, RX, bs*ci); scales/biases: per-input
    (bs*ci,) vectors or None (identity / zero).  Returns the raw conv
    output in the same padded layout (pad rows zero).
    """
    kY, kX, kz, ci, co = w.shape
    band, wplus, wminus = _band_wrap_matrices(w.astype(xs[0].dtype), bs)
    return _fused_conv_ref_mats(xs, scales, biases, band, wplus, wminus,
                                kY, kX, X, nb, bs, relu,
                                preferred_element_type)


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------

def relu_grad_mask(pre, val):
    """``val`` where ``pre > 0`` else 0 — the relu-derivative gate of
    the dx kernels, with the compare idiom selectable at trace time via
    MMF_MASK_IDIOM:

      bitcast (default)  the predicate as a signed-int32 ordering of
                         the fp32 bit pattern: for non-NaN x,
                         ``x > 0.0  <=>  bitcast_int32(x) > 0`` (+0 and
                         -0 both map to non-positive ints).  Uses only
                         int32 vector compares — the construct every
                         working kernel mask already relies on.
      f32                the direct fp32 vector compare (round <=4
                         idiom).

    Round-5 on-chip finding (results/stage_triage.log + CLAUDE.md): the
    direct fp32 vector compare — the ONLY float vector compare in the
    kernel stack — silently returns garbage on current Mosaic when its
    operand chain starts at bf16 (the outright-REJECTED sub-32-bit
    compare class, mis-lowered instead of erroring once an upcast hides
    it): dx came back ~zeros and ds/db garbage in every bf16 backward
    variant while fwd/dw (maximum / int32-compare masks) were exact.
    tools/repro_dx_bf16.py A/Bs the two idioms on chip.
    """
    pre32 = pre.astype(jnp.float32)
    if os.environ.get("MMF_MASK_IDIOM", "bitcast") == "f32":
        # legacy escape hatch, KNOWN-miscompiling on bf16-upcast data —
        # reachable only via explicit MMF_MASK_IDIOM=f32
        return jnp.where(pre32 > 0, val, 0.0)  # mosaic-f32-ok: legacy
    bits = lax.bitcast_convert_type(pre32, jnp.int32)
    return jnp.where(bits > 0, val, 0.0)  # mosaic-f32-ok: int32 compare


def _roll_rows(v, shift: int):
    """Row rotate; Mosaic only implements rotate for 32-bit data, so
    16-bit values round-trip through fp32 (one cheap VPU pass each way).
    """
    if v.dtype.itemsize == 4:
        return pltpu.roll(v, shift, 0)  # mosaic-roll-ok: guarded itemsize==4
    return pltpu.roll(v.astype(jnp.float32), shift, 0).astype(v.dtype)


def _use_rollfree() -> bool:
    """Roll-free tap reads for the kX==3 kernels (MMF_ROLLFREE).

    The round-5 step-cost model (PERF.md roadmap a) showed the grid-step
    count dominates the step (~27 us fixed cost per grid step) and that
    G is capped by IN-KERNEL VMEM TEMPS — chiefly the materialized
    pltpu.roll copies per X tap (each a (G*RX, CC) slab, with an extra
    fp32 round-trip for bf16).  Roll-free form: the activated slab is
    stored ONCE into a halo-padded VMEM scratch and every tap (band and
    z-wraps alike) becomes a static OFFSET-SLICE read — no rotated
    copies, no upcasts, so the slab budget (and G) can grow."""
    return os.environ.get("MMF_ROLLFREE", "0") == "1"


def _halo_pad(nb: int) -> int:
    """Halo rows on each side of the roll-free scratch: the largest tap
    offset is nb+1 (X tap +- z wrap), rounded up to the 16-row sublane
    tile so the one big store stays tile-aligned.  The halo rows are
    zeroed once at grid step 0 and never written again; every output
    row that would read a halo row is masked by the existing boundary
    masks (a shift crossing an nb-group boundary is never valid), so
    the zeros are hygiene, not semantics."""
    return -(-(nb + 1) // 16) * 16


def _slab_cap(cap: int, RX: int, CC: int, itemsize: int,
              rf: bool = False) -> int:
    """Shrink a row-group cap so ONE (G, RX, CC) slab stays under
    MMF_SLAB_MB (default 4 MB; 9 MB for the roll-free kernels).

    The multi-row kernels (MMF_G1 / MMF_YCHUNK) hold several such slabs
    at once — x, g [, y] in, dx out — and Mosaic double-buffers each
    for grid pipelining.  At the flagship stage-1 TRAIN shapes
    (RX = 128*62 = 7936, CC = 128) a G=8 slab is 16 MB, so the merged
    backward's working set blows past VMEM: the small-shape triage
    compiles every kernel while the full-shape step is rejected
    (BENCH_r04's `tpu_compile_helper exit 1` signature).  Capping by
    slab bytes keeps G=8 on the small stages (where per-step overhead
    actually hurts) and degrades gracefully to per-row at stage 1/2.

    ``rf``: the roll-free kernels (see :func:`_use_rollfree`) hold ~3x
    fewer live temps (no rotated copies / upcast round-trips), so their
    unset-env default budget is larger (9 MB: G=4 at stage 1's 2.03 MB
    rows, G=8 at stage 2's 1.02 MB rows).  An explicit MMF_SLAB_MB
    overrides both defaults (the on-chip A/B knob)."""
    env = os.environ.get("MMF_SLAB_MB")
    try:
        budget = ((9.0 if rf else 4.0) if env is None
                  else float(env)) * 2 ** 20
    except ValueError:
        budget = 4 * 2 ** 20
    per_row = RX * CC * itemsize
    while cap > 1 and cap * per_row > budget:
        cap //= 2
    return cap


def _g1_G(Y: int, RX: int, CC: int, itemsize: int = 2,
          rf: bool = False) -> int:
    """Rows-per-grid-step for the kY==1 kernels: largest G in {8, 4, 2}
    dividing Y, capped by MMF_G1 (unset = 8; "0"/"1" disables — the
    on-chip A/B escape hatch, tools/onchip_r4.py) and by the
    MMF_SLAB_MB VMEM budget (see _slab_cap)."""
    try:
        cap = int(os.environ.get("MMF_G1", "8"))
    except ValueError:
        cap = 8
    cap = _slab_cap(cap, RX, CC, itemsize, rf=rf)
    for g in (8, 4, 2):
        if g <= cap and Y % g == 0:
            return g
    return 1


def _kernel(*refs, n_in: int, kY: int, kX: int, kz: int,
            X: int, nb: int, bs: int, relu: bool, Y: int, out_dtype,
            with_stats: bool = False, with_dyn: bool = False,
            dyn_valid_in: int = 0, G: int = 1):
    # operand order: per input i: kY slabs; then per input: scale, bias;
    # [ext_ref when with_dyn;] then band [, wplus, wminus]; finally
    # out_ref [, s1_ref, s2_ref].
    #
    # G > 1 (kY==1 only, MMF_G1): the block carries G consecutive Y rows
    # processed as ONE (G*RX, CC) slab — fewer grid steps, G*-larger DMAs
    # and dots.  All row masks use the WITHIN-Y-row index (row % RX), so
    # a roll crossing a Y-row boundary lands only on rows whose tap is
    # masked anyway (the same argument as the X-group boundary masks).
    idx = 0
    x_refs = []
    for _ in range(n_in):
        x_refs.append([refs[idx + d] for d in range(kY)])
        idx += kY
    sb_refs = []
    for _ in range(n_in):
        sb_refs.append((refs[idx], refs[idx + 1]))
        idx += 2
    if with_dyn:
        # exact bucketing under the FUSED path (eval): (3,) int32 true
        # extents [yt, xt, zt] in device coords.  The prologue re-zeroes
        # the affine output beyond them (the bias makes padding non-zero
        # otherwise), reproducing the per-op path's per-op masking.
        ext_ref = refs[idx]; idx += 1
    band_ref = refs[idx]; idx += 1
    if kz == 3:
        wrap_ref = refs[idx]; idx += 1  # wplus + wminus (disjoint cols)
    out_ref = refs[idx]; idx += 1
    if with_stats:
        # BN-stats epilogue (round 4, PERF.md roadmap 1): per-lane sum /
        # sum-of-squares of the OUTPUT accumulated across grid steps,
        # saving the separate full-buffer interior_stats read.  The TPU
        # grid runs sequentially, so `+=` accumulators are safe (same
        # pattern as the dx kernel's ds/db outputs).
        s1_ref = refs[idx]; idx += 1
        s2_ref = refs[idx]

    y = pl.program_id(1)
    RX = X * nb
    R = G * RX
    assert G == 1 or kY == 1, (G, kY)
    if with_stats:
        step = pl.program_id(0) * pl.num_programs(1) + y

        @pl.when(step == 0)
        def _():
            s1_ref[...] = jnp.zeros_like(s1_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    # within-Y-row index: masks have period RX over the G-row slab
    rloc = jax.lax.rem(rows_i, RX) if G > 1 else rows_i
    mrow = jax.lax.rem(rows_i, nb)
    head_m = mrow != 0
    tail_m = mrow != nb - 1
    # per-tap X-boundary masks (padless layout: a roll by ±nb wraps
    # real rows from the opposite X edge — mask the boundary group)
    tap_row_m = {0: rloc >= nb, 1: None, 2: rloc < RX - nb}
    if kz == 3:
        # wplus writes only col-block 0, wminus only col-block bs-1 —
        # one combined dot, contributions separated by column masks.
        CCo = out_ref.shape[-1]
        co = CCo // bs
        col = jax.lax.broadcasted_iota(jnp.int32, (R, CCo), 1)
        head_cols = jnp.logical_and(head_m, col < co)
        tail_cols = jnp.logical_and(tail_m, col >= (bs - 1) * co)

    if with_dyn:
        xt = ext_ref[1]
        zt = ext_ref[2]
        CC_in = x_refs[0][0].shape[-1]
        ci_in = CC_in // bs
        xg = rloc // nb                         # (R, 1) int32
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CC_in), 1)
        j_in = lane // ci_in
        # slot-sparse buffers (the strided cascade) hold logical
        # z = m*valid_in + j with only slots j < valid_in live;
        # dyn_valid_in=0 means dense (valid_in == bs).
        vi = dyn_valid_in or bs
        zlog = mrow * vi + j_in                 # (R, CC) int32
        dyn_valid = jnp.logical_and(
            jnp.logical_and(
                xg < xt,     # mosaic-f32-ok: int32 compare
                zlog < zt),  # mosaic-f32-ok: int32 compare
            j_in < vi)       # mosaic-f32-ok: int32 compare
        if G > 1:
            # per-sub-row Y validity (the G==1 path applies it as one
            # scalar per slab below)
            yrow = y * G + rows_i // RX          # (R, 1) int32
            dyn_valid = jnp.logical_and(
                dyn_valid,
                yrow < ext_ref[0])  # mosaic-f32-ok: int32 compare

    acc = None
    for dy in range(kY):
        t = None
        for i in range(n_in):
            xv = (x_refs[i][dy][0].reshape(R, -1) if G > 1
                  else x_refs[i][dy][0, 0])
            s_ref, b_ref = sb_refs[i]
            term = xv * s_ref[:] + b_ref[:]
            t = term if t is None else t + term
        if relu:
            t = jnp.maximum(t, 0.0)
        if with_dyn:
            t = jnp.where(dyn_valid, t, jnp.zeros((), t.dtype))
            if G == 1:
                # the slab may lie beyond the true Y extent — its
                # (x, z)-valid entries still carry affine garbage
                yy_d = y + dy - kY // 2
                yv = jnp.logical_and(
                    yy_d >= 0,
                    yy_d < ext_ref[0])  # mosaic-f32-ok: int32 scalar
                t = t * yv.astype(t.dtype)
        part = None
        for dx in range(kX):
            tap = dy * kX + dx
            rows = _roll_rows(t, ((1 - dx) * nb) % R) \
                if kX == 3 else t
            a = jax.lax.dot_general(
                rows, band_ref[tap],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if kz == 3:
                p = jax.lax.dot_general(
                    rows, wrap_ref[tap],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                a = a + jnp.where(head_cols, _roll_rows(p, 1), 0.0)
                a = a + jnp.where(tail_cols, _roll_rows(p, R - 1), 0.0)
            if kX == 3 and tap_row_m[dx] is not None:
                # band + wraps of one tap share the source x-group
                a = jnp.where(tap_row_m[dx], a, 0.0)
            part = a if part is None else part + a
        if kY > 1:
            # index_map clamps out-of-range y slabs; zero their taps.
            yy = y + dy - kY // 2
            vmask = jnp.logical_and(yy >= 0, yy < Y).astype(jnp.float32)
            part = part * vmask
        acc = part if acc is None else acc + part

    yv = acc.astype(out_dtype)
    if G > 1:
        out_ref[0] = yv.reshape(G, RX, -1)
    else:
        out_ref[0, 0] = yv
    if with_stats:
        # stats of the ROUNDED output (what interior_stats would read
        # back from HBM), accumulated in fp32.
        yf = yv.astype(jnp.float32)
        s1_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
        s2_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _rf_kernel(*refs, n_in: int, kz: int, X: int, nb: int, bs: int,
               relu: bool, Y: int, out_dtype, with_stats: bool = False,
               with_dyn: bool = False, dyn_valid_in: int = 0,
               G: int = 1):
    """Roll-free forward kernel (kY==1, kX==3 — the hot (1,3,3) stage
    convs; see :func:`_use_rollfree`).  Same operand order as
    :func:`_kernel` plus a trailing halo-padded VMEM scratch.

    Two Mosaic lessons shape the form (results/stage_rollfree_s1full.log):
    every tap — X band taps AND z wraps — is a static OFFSET-SLICE read
    of the scratch (no pltpu.roll copies, no bf16->fp32 round-trips),
    and the compute is CHUNKED PER Y-SUBROW (static G-unrolled loop):
    a flat (G*RX, CC) body makes the register allocator hold G-row
    intermediates in vregs and spill (~124 MB of spill slots at
    stage-1 G=4, the same scoped-OOM signature as the round-4 full-step
    rejection), while per-subrow temps stay (RX, CC)-sized and die at
    each iteration's out write.  Cross-subrow tap reads are exactly the
    rows the per-tap boundary masks already zero; the scratch halo is
    zeroed once at grid step 0 so edge reads are inert."""
    idx = 0
    x_refs = [refs[idx + i] for i in range(n_in)]
    idx += n_in
    sb_refs = []
    for _ in range(n_in):
        sb_refs.append((refs[idx], refs[idx + 1]))
        idx += 2
    if with_dyn:
        ext_ref = refs[idx]; idx += 1
    band_ref = refs[idx]; idx += 1
    if kz == 3:
        wrap_ref = refs[idx]; idx += 1
    out_ref = refs[idx]; idx += 1
    if with_stats:
        s1_ref = refs[idx]; idx += 1
        s2_ref = refs[idx]; idx += 1
    ts_ref = refs[idx]

    y = pl.program_id(1)
    RX = X * nb
    PAD = _halo_pad(nb)
    step = pl.program_id(0) * pl.num_programs(1) + y

    @pl.when(step == 0)
    def _():
        zh = jnp.zeros((PAD, ts_ref.shape[1]), ts_ref.dtype)
        ts_ref[pl.ds(0, PAD)] = zh
        ts_ref[pl.ds(PAD + G * RX, PAD)] = zh
        if with_stats:
            s1_ref[...] = jnp.zeros_like(s1_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (RX, 1), 0)
    mrow = jax.lax.rem(rows_i, nb)
    head_m = mrow != 0
    tail_m = mrow != nb - 1
    tap_row_m = {0: rows_i >= nb, 1: None, 2: rows_i < RX - nb}
    if kz == 3:
        CCo = out_ref.shape[-1]
        co = CCo // bs
        col = jax.lax.broadcasted_iota(jnp.int32, (RX, CCo), 1)
        head_cols = jnp.logical_and(head_m, col < co)
        tail_cols = jnp.logical_and(tail_m, col >= (bs - 1) * co)

    if with_dyn:
        xt = ext_ref[1]
        zt = ext_ref[2]
        CC_in = x_refs[0].shape[-1]
        ci_in = CC_in // bs
        xg = rows_i // nb
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CC_in), 1)
        j_in = lane // ci_in
        vi = dyn_valid_in or bs
        zlog = mrow * vi + j_in
        dyn_valid = jnp.logical_and(
            jnp.logical_and(
                xg < xt,     # mosaic-f32-ok: int32 compare
                zlog < zt),  # mosaic-f32-ok: int32 compare
            j_in < vi)       # mosaic-f32-ok: int32 compare

    # phase 1: affine(+relu)(+dyn mask) per subrow into the scratch —
    # all subrows must land before any tap reads across them.
    for k in range(G):
        t = None
        for i in range(n_in):
            s_ref, b_ref = sb_refs[i]
            term = x_refs[i][0, k] * s_ref[:] + b_ref[:]
            t = term if t is None else t + term
        if relu:
            t = jnp.maximum(t, 0.0)
        if with_dyn:
            t = jnp.where(dyn_valid, t, jnp.zeros((), t.dtype))
            yk = y * G + k
            yv_ok = yk < ext_ref[0]  # mosaic-f32-ok: int32 scalar
            t = t * yv_ok.astype(t.dtype)
        ts_ref[pl.ds(PAD + k * RX, RX)] = t

    # phase 2: per subrow, all taps as offset reads of the scratch.
    dn = (((1,), (0,)), ((), ()))
    for k in range(G):
        base = PAD + k * RX
        acc = None
        for dx in range(3):
            off = (dx - 1) * nb
            a = jax.lax.dot_general(
                ts_ref[pl.ds(base + off, RX)], band_ref[dx],
                dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            if kz == 3:
                # z-wraps as offset reads: head term at out row r is
                # t[r + off - 1] @ wrap, tail t[r + off + 1] @ wrap
                # (disjoint column blocks of the combined wrap matrix).
                ph = jax.lax.dot_general(
                    ts_ref[pl.ds(base + off - 1, RX)], wrap_ref[dx],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                pt = jax.lax.dot_general(
                    ts_ref[pl.ds(base + off + 1, RX)], wrap_ref[dx],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                a = a + jnp.where(head_cols, ph, 0.0)
                a = a + jnp.where(tail_cols, pt, 0.0)
            if tap_row_m[dx] is not None:
                a = jnp.where(tap_row_m[dx], a, 0.0)
            acc = a if acc is None else acc + a
        yv = acc.astype(out_dtype)
        out_ref[0, k] = yv
        if with_stats:
            yf = yv.astype(jnp.float32)
            s1_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
            s2_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


def fused_conv_pallas(xs, scales, biases, w, X: int, nb: int, bs: int,
                      relu: bool = True,
                      preferred_element_type=jnp.float32,
                      interpret: bool = False) -> jnp.ndarray:
    """Pallas execution of :func:`fused_conv_ref` (same contract)."""
    kY, kX, kz, ci, co = w.shape
    band, wplus, wminus = _band_wrap_matrices(w, bs)
    return _fused_conv_pallas_mats(
        xs, scales, biases, band, wplus, wminus, kY, kX, X, nb, bs,
        relu, preferred_element_type, interpret)


def _fused_conv_pallas_mats(xs, scales, biases, band, wplus, wminus,
                            kY: int, kX: int, X: int, nb: int, bs: int,
                            relu: bool, preferred_element_type,
                            interpret: bool = False,
                            with_stats: bool = False,
                            dyn_extents=None, dyn_valid_in: int = 0):
    n_in = len(xs)
    B, Y, RX, CC = xs[0].shape
    ci = CC // bs
    co = band.shape[-1] // bs
    kz = 3 if wplus is not None else 1
    assert RX == X * nb, (xs[0].shape, X, nb)
    dt = xs[0].dtype

    if kY == 3 and kX == 1 and wplus is None and not dyn_valid_in:
        # (3,1,1) convs: the Y-chunked kernel reads (1+2/G)x instead of
        # 3x of the input (PERF.md roadmap 2).
        G = _ychunk_G(Y, RX, max(CC, band.shape[-1]), dt.itemsize)
        if G:
            return _fused_conv_pallas_yck(
                xs, scales, biases, band, G, X, nb, bs, relu,
                preferred_element_type, interpret, with_stats,
                dyn_extents)

    # kY==1 (the (1,3,3)/(1,1,3) convs — 4 of 5 stage convs + the
    # cascades): G consecutive Y rows per grid step (MMF_G1, default 8).
    rf = kY == 1 and kX == 3 and _use_rollfree()
    G1 = _g1_G(Y, RX, max(CC, band.shape[-1]),
               dt.itemsize, rf=rf) if kY == 1 else 1

    ops = []
    in_specs = []
    for i in range(n_in):
        for dy in range(kY):
            off = dy - kY // 2
            ops.append(xs[i])
            if G1 > 1:
                in_specs.append(pl.BlockSpec(
                    (1, G1, RX, CC), lambda b, y: (b, y, 0, 0),
                    memory_space=pltpu.VMEM))
                continue
            in_specs.append(pl.BlockSpec(
                (1, 1, RX, CC),
                lambda b, y, off=off: (b, jnp.clip(y + off, 0, Y - 1),
                                       0, 0),
                memory_space=pltpu.VMEM))
    for i in range(n_in):
        s = scales[i]
        b = biases[i]
        ops.append(jnp.ones((1, CC), dt) if s is None
                   else s.astype(dt).reshape(1, CC))
        ops.append(jnp.zeros((1, CC), dt) if b is None
                   else b.astype(dt).reshape(1, CC))
        in_specs += [pl.BlockSpec((1, CC), lambda b, y: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2

    if dyn_extents is not None:
        yt, xt, zt = dyn_extents
        ops.append(jnp.stack([jnp.asarray(yt, jnp.int32),
                              jnp.asarray(xt, jnp.int32),
                              jnp.asarray(zt, jnp.int32)]))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    nt = band.shape[0]
    w_spec = pl.BlockSpec((nt, bs * ci, bs * co), lambda b, y: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    ops.append(band.astype(dt))
    in_specs.append(w_spec)
    if kz == 3:
        ops.append((wplus + wminus).astype(dt))
        in_specs.append(w_spec)

    if rf:
        kern = functools.partial(
            _rf_kernel, n_in=n_in, kz=kz, X=X, nb=nb, bs=bs,
            relu=relu, Y=Y, out_dtype=preferred_element_type,
            with_stats=with_stats, with_dyn=dyn_extents is not None,
            dyn_valid_in=dyn_valid_in, G=G1)
    else:
        kern = functools.partial(
            _kernel, n_in=n_in, kY=kY, kX=kX, kz=kz, X=X, nb=nb, bs=bs,
            relu=relu, Y=Y, out_dtype=preferred_element_type,
            with_stats=with_stats, with_dyn=dyn_extents is not None,
            dyn_valid_in=dyn_valid_in, G=G1)
    scratch_shapes = ()
    if rf:
        PAD = _halo_pad(nb)
        scratch_shapes = (pltpu.VMEM((G1 * RX + 2 * PAD, CC), dt),)

    y_spec = pl.BlockSpec((1, G1, RX, bs * co),
                          lambda b, y: (b, y, 0, 0),
                          memory_space=pltpu.VMEM)
    y_shape = jax.ShapeDtypeStruct((B, Y, RX, bs * co),
                                   preferred_element_type)
    if with_stats:
        acc_spec = pl.BlockSpec((1, bs * co), lambda b, y: (0, 0),
                                memory_space=pltpu.VMEM)
        acc_shape = jax.ShapeDtypeStruct((1, bs * co), jnp.float32)
        out_specs = (y_spec, acc_spec, acc_spec)
        out_shape = (y_shape, acc_shape, acc_shape)
    else:
        out_specs, out_shape = y_spec, y_shape
    return pl.pallas_call(
        kern,
        grid=(B, Y // G1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(*ops)


# --------------------------------------------------------------------------
# Custom-VJP boundary
# --------------------------------------------------------------------------
#
# The boundary op takes the band/wrap MATRICES (not the logical kernel):
# the logical-w -> band expansion is a differentiable einsum outside the
# boundary, so its pullback (the band-diagonal collapse) comes from
# plain autodiff.  The bwd pass recomputes t from the saved inputs
# (nothing expanded is kept alive), computes dx with the SAME kernel
# form on flipped/transposed matrices (row rolls commute with row-wise
# dots), and the matrix cotangents as full-lane M-contractions.

def _mats_T(band, wplus, wminus):
    rev = band[::-1]
    bandT = jnp.swapaxes(rev, -1, -2)
    if wplus is None:
        return bandT, None, None
    wplusT = jnp.swapaxes(wminus[::-1], -1, -2)
    wminusT = jnp.swapaxes(wplus[::-1], -1, -2)
    return bandT, wplusT, wminusT


# Test hook: when True, 'pallas' impl runs the kernels in interpret
# mode — the CPU CI executes the KERNEL code (index maps, rolls, masks,
# accumulator init), not just its XLA twin (VERDICT r2 weak #3).
_INTERPRET = False


def set_interpret_mode(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(flag)


# --------------------------------------------------------------------------
# Space (en-face width) sharding
# --------------------------------------------------------------------------
#
# GSPMD cannot partition pallas_call, so under a mesh with a sharded X
# axis the fused ops run inside shard_map: the affine+ReLU prologue is
# computed per-shard in XLA, the ACTIVATED rows are halo-exchanged
# (edge halos zeroed — correct because contributions are linear in t
# and a zero t contributes nothing), and the kernel runs with an
# identity prologue on the halo-extended slab.  kX == 1 ops (the
# strided projection cascade, 1x1 convs, pools) need no halo at all.

_SPACE = None  # (mesh, data_axis_or_None, space_axis) or None


def set_space_sharding(mesh, space_axis: str = "space",
                       data_axis: str = "data") -> None:
    """Declare the active device mesh for the fused lowerings.  With a
    >1-sized ``space_axis`` the fused ops wrap themselves in shard_map
    (row/X sharding + halo exchange); pass None to clear."""
    global _SPACE
    if mesh is None or space_axis not in mesh.axis_names \
            or mesh.shape[space_axis] <= 1:
        _SPACE = None
    else:
        da = data_axis if data_axis in mesh.axis_names else None
        _SPACE = (mesh, da, space_axis)


def active_space_shards() -> int:
    """Number of X shards the fused ops will split over (1 = none)."""
    return 1 if _SPACE is None else _SPACE[0].shape[_SPACE[2]]


def _row_specs():
    from jax.sharding import PartitionSpec as P
    mesh, da, sa = _SPACE
    return P(da, None, sa, None), P()


def _with_halo(t, nb: int, axis: str, ns: int):
    """Concat the neighbors' boundary X-groups (nb rows each side);
    the true-edge halos are zeroed."""
    idx = jax.lax.axis_index(axis)
    left = jax.lax.ppermute(
        t[:, :, -nb:, :], axis, [(i, (i + 1) % ns) for i in range(ns)])
    left = jnp.where(idx == 0, jnp.zeros_like(left), left)
    right = jax.lax.ppermute(
        t[:, :, :nb, :], axis, [(i, (i - 1) % ns) for i in range(ns)])
    right = jnp.where(idx == ns - 1, jnp.zeros_like(right), right)
    return jnp.concatenate([left, t, right], axis=2)


def _fused_op_sharded(cfg, xs, scales, biases, band, wplus, wminus):
    from jax import shard_map
    mesh, da, sa = _SPACE
    ns = mesh.shape[sa]
    kY, kX, X, nb, bs, relu = cfg[:6]
    assert X % ns == 0, (X, ns)
    Xl = X // ns
    bspec, rspec = _row_specs()

    if kX == 3:
        cfg_l = (kY, kX, Xl + 2, *cfg[3:5], False, *cfg[6:])

        def per_shard(xs_l, scales_l, biases_l, band_l, wplus_l,
                      wminus_l):
            t = _affine_t(list(xs_l), list(scales_l), list(biases_l),
                          relu)
            t_ext = _with_halo(t, nb, sa, ns)
            y = _fused_op(cfg_l, (t_ext,), (None,), (None,), band_l,
                          wplus_l, wminus_l)
            return y[:, :, nb:-nb, :]
    else:
        cfg_l = (kY, kX, Xl, *cfg[3:])

        def per_shard(xs_l, scales_l, biases_l, band_l, wplus_l,
                      wminus_l):
            return _fused_op(cfg_l, tuple(xs_l), tuple(scales_l),
                             tuple(biases_l), band_l, wplus_l, wminus_l)

    operands = (tuple(xs), tuple(scales), tuple(biases), band, wplus,
                wminus)
    in_specs = jax.tree.map(lambda _: rspec, operands)
    in_specs = (tuple(bspec for _ in xs),) + in_specs[1:]
    return shard_map(per_shard, mesh=mesh, in_specs=in_specs,
                     out_specs=bspec, check_vma=False)(*operands)


def _use_pallas_impl(impl: str) -> bool:
    if impl == "pallas":
        return True
    return impl == "auto" and jax.default_backend() == "tpu"


def _run_impl(cfg, xs, scales, biases, band, wplus, wminus):
    kY, kX, X, nb, bs, relu, pet_name, impl = cfg[:8]
    pet = jnp.dtype(pet_name).type
    if _use_pallas_impl(impl):
        return _fused_conv_pallas_mats(
            list(xs), list(scales), list(biases), band, wplus, wminus,
            kY, kX, X, nb, bs, relu, pet, interpret=_INTERPRET)
    return _fused_conv_ref_mats(
        list(xs), list(scales), list(biases), band, wplus, wminus,
        kY, kX, X, nb, bs, relu, pet)


def _stats_of(y):
    """(1, CCo) fp32 per-lane sum / sum-of-squares of a thick-layout
    output — the XLA twin of the kernel's stats epilogue."""
    yf = y.astype(jnp.float32)
    return (jnp.sum(yf, axis=(0, 1, 2)).reshape(1, -1),
            jnp.sum(yf * yf, axis=(0, 1, 2)).reshape(1, -1))


def _run_impl_ws(cfg, xs, scales, biases, band, wplus, wminus):
    """Like :func:`_run_impl` but also returns the output's per-lane
    (sum, sum-of-squares) — fused into the kernel epilogue on the
    Pallas path, an XLA reduction on the ref path."""
    kY, kX, X, nb, bs, relu, pet_name, impl = cfg[:8]
    pet = jnp.dtype(pet_name).type
    if _use_pallas_impl(impl):
        return _fused_conv_pallas_mats(
            list(xs), list(scales), list(biases), band, wplus, wminus,
            kY, kX, X, nb, bs, relu, pet, interpret=_INTERPRET,
            with_stats=True)
    y = _fused_conv_ref_mats(
        list(xs), list(scales), list(biases), band, wplus, wminus,
        kY, kX, X, nb, bs, relu, pet)
    s1, s2 = _stats_of(y)
    return y, s1, s2


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_op(cfg, xs, scales, biases, band, wplus, wminus):
    return _run_impl(cfg, xs, scales, biases, band, wplus, wminus)


def _fused_fwd(cfg, xs, scales, biases, band, wplus, wminus):
    y = _run_impl(cfg, xs, scales, biases, band, wplus, wminus)
    return y, (xs, scales, biases, band, wplus, wminus)


def _fused_bwd(cfg, res, g):
    return _fused_bwd_impl(cfg, res, g)


def _fused_bwd_impl(cfg, res, g, stats_cot=None):
    """Shared backward body.  ``stats_cot`` = (y_out, gs1, gs2) threads
    the output-stats cotangent (g_total = g + gs1 + 2*y*gs2) into the
    dx/dband kernel PROLOGUES instead of materializing g_total in HBM
    (only set on the Pallas path — the caller pre-folds otherwise)."""
    kY, kX, X, nb, bs, relu, pet_name, impl, wp_slots, wm_slots = cfg
    xs, scales, biases, band, wplus, wminus = res
    B, Y, RX, CC = xs[0].shape
    dt_ = xs[0].dtype

    head, tail, _, _ = _np_masks(RX, X, nb)
    to = lambda a: jnp.asarray(a[:, None], dt_)
    head_m, tail_m = to(head), to(tail)

    gm = g.astype(dt_)
    use_pallas = _use_pallas_impl(impl)

    # Merged dx+dband backward (round 4): both kernels read the same
    # x/g[/y] slabs, so one kernel emitting dx, ds, db AND the weight
    # cotangents deletes a full (x + g [+ y]) read per conv.  kY==1
    # directly; kY==3 via the chunked variant.  MMF_MERGED_BWD=0
    # reverts to the split kernels (on-chip A/B).
    merged = (use_pallas
              and os.environ.get("MMF_MERGED_BWD", "1") != "0"
              and (kY == 1 or (kY == 3 and kX == 1 and wplus is None
                               and _ychunk_G(
                                   xs[0].shape[1], xs[0].shape[2],
                                   max(xs[0].shape[3], g.shape[-1]),
                                   xs[0].dtype.itemsize) > 0)))

    bandT, wplusT, wminusT = _mats_T(band, wplus, wminus)
    dband_k = dwplus_k = dwminus_k = None
    if merged:
        dxs, dss, db_sum, dband_k, dwplus_k, dwminus_k = _dx_pallas(
            list(xs), list(scales), list(biases), g, bandT, wplusT,
            wminusT, kY, kX, X, nb, bs, relu,
            head_block=wm_slots[0], tail_block=wp_slots[0],
            interpret=_INTERPRET, stats_cot=stats_cot, want_band=True)
        dscales = [None if s is None else dss[i]
                   for i, s in enumerate(scales)]
        dbiases = [None if b is None else db_sum for b in biases]
    elif use_pallas:
        # transposed conv + the whole input-side epilogue (relu mask,
        # per-input scaling, affine-cotangent reductions) in one kernel.
        # wplusT = wminus^T writes col block wm_slots[0] (its source
        # row slot); wminusT = wplus^T writes col block wp_slots[0].
        dxs, dss, db_sum = _dx_pallas(
            list(xs), list(scales), list(biases), g, bandT, wplusT,
            wminusT, kY, kX, X, nb, bs, relu,
            head_block=wm_slots[0], tail_block=wp_slots[0],
            interpret=_INTERPRET, stats_cot=stats_cot)
        dscales = [None if s is None else dss[i]
                   for i, s in enumerate(scales)]
        dbiases = [None if b is None else db_sum for b in biases]
    else:
        cfgT = (kY, kX, X, nb, bs, False, pet_name, impl,
                wm_slots, wp_slots)
        dt_full = _run_impl(cfgT, (gm,), (None,), (None,),
                            bandT, wplusT, wminusT).astype(dt_)

        # pre-activation recompute -> relu mask + affine cotangents
        pre = None
        for x, s, b in zip(xs, scales, biases):
            term = x if s is None else x * s.astype(dt_)
            if b is not None:
                term = term + b.astype(dt_)
            pre = term if pre is None else pre + term
        if relu:
            dtm = dt_full * (pre > 0).astype(dt_)
        else:
            dtm = dt_full

        dxs = []
        dscales = []
        dbiases = []
        for x, s, b in zip(xs, scales, biases):
            dxs.append(dtm if s is None else dtm * s.astype(dt_))
            dscales.append(None if s is None
                           else jnp.sum(dtm * x, axis=(0, 1, 2)))
            dbiases.append(None if b is None
                           else jnp.sum(dtm, axis=(0, 1, 2)))

    # Matrix cotangents: full-M contractions per tap, expressed with
    # OFFSET SLICES of t / gm (never materialized rolls — XLA fuses the
    # slice reads into the dot operands).  The wrap matrices have one
    # nonzero (row-block, col-block) pair — (bs-1, 0) for wplus, (0,
    # bs-1) for wminus — so their cotangents only need a NARROW (ci, co)
    # dot each, padded back to dense shape (the einsum pullback outside
    # the boundary projects onto those entries anyway).
    if not use_pallas:
        t = jnp.maximum(pre, 0.0) if relu else pre
    CC = xs[0].shape[-1]
    ci = CC // bs
    CCo = g.shape[-1]
    co = CCo // bs
    contract = ((0, 1, 2), (0, 1, 2))

    def shifted_dot(a, b, oy, orow, a_cols=None, b_cols=None):
        """sum_r a[:, y+oy, r+orow, a_cols]^T b[:, y, r, b_cols]."""
        y_lo, y_hi = max(0, -oy), min(Y, Y - oy)
        r_lo, r_hi = max(0, -orow), min(RX, RX - orow)
        a_sl = a[:, y_lo + oy:y_hi + oy, r_lo + orow:r_hi + orow]
        b_sl = b[:, y_lo:y_hi, r_lo:r_hi]
        if a_cols is not None:
            a_sl = a_sl[..., a_cols[0]:a_cols[1]]
        if b_cols is not None:
            b_sl = b_sl[..., b_cols[0]:b_cols[1]]
        return lax.dot_general(
            a_sl, b_sl, dimension_numbers=(contract, ((), ())),
            preferred_element_type=jnp.float32)

    hg = head_m * gm if wplus is not None else None
    tg = tail_m * gm if wplus is not None else None
    dband = None
    if merged:
        dband = dband_k.astype(band.dtype)
    elif use_pallas:
        # all taps (band + both wrap cotangents) in one accumulating
        # kernel: t recomputed in-VMEM, each slab read once (the XLA
        # loop re-reads the shifted operands per tap — measured 5.3 ms
        # band + 5.2 ms narrow-wrap per s1 conv vs ~3 total here).
        res_k = _dband_pallas(list(xs), list(scales), list(biases), g,
                              kY, kX, X, nb, bs, relu,
                              want_wrap=(wplus is not None),
                              interpret=_INTERPRET, stats_cot=stats_cot)
        if wplus is not None:
            dband, dwplus_k, dwminus_k = res_k
        else:
            dband = res_k
        dband = dband.astype(band.dtype)
    dband_l = []
    dwp = []
    dwm = []
    for dy in range(kY):
        for dx in range(kX):
            oy = dy - kY // 2
            ox = (dx - kX // 2) * nb
            if not use_pallas:
                dband_l.append(shifted_dot(t, gm, oy, ox))
            if wplus is not None and not use_pallas:
                # fwd: out[r] += head_m[r] * (rows @ wplus)[r-1]
                #   => dwplus = sum_r rows[r]^T hg[r+1].  The wrap
                # matrices have ONE nonzero (row-slot, col-slot) pair —
                # (bs-1, 0) for the stride-1 wplus, (valid_in-1, 0) for
                # the strided cascade — carried in cfg.
                ps, pd = wp_slots
                small_p = shifted_dot(t, hg, oy, ox - 1,
                                      a_cols=(ps * ci, (ps + 1) * ci),
                                      b_cols=(pd * co, (pd + 1) * co))
                dwp.append(jnp.pad(
                    small_p, [(ps * ci, (bs - 1 - ps) * ci),
                              (pd * co, (bs - 1 - pd) * co)]))
                ms, md = wm_slots
                small_m = shifted_dot(t, tg, oy, ox + 1,
                                      a_cols=(ms * ci, (ms + 1) * ci),
                                      b_cols=(md * co, (md + 1) * co))
                dwm.append(jnp.pad(
                    small_m, [(ms * ci, (bs - 1 - ms) * ci),
                              (md * co, (bs - 1 - md) * co)]))
    if dband is None:
        dband = jnp.stack(dband_l).astype(band.dtype)
    if wplus is None:
        dwplus = dwminus = None
    elif use_pallas:
        dwplus = dwplus_k.astype(band.dtype)
        dwminus = dwminus_k.astype(band.dtype)
    else:
        dwplus = jnp.stack(dwp).astype(band.dtype)
        dwminus = jnp.stack(dwm).astype(band.dtype)
    return (tuple(dxs), tuple(dscales), tuple(dbiases),
            dband, dwplus, dwminus)


_fused_op.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_op_ws(cfg, xs, scales, biases, band, wplus, wminus):
    return _run_impl_ws(cfg, xs, scales, biases, band, wplus, wminus)


def _fused_ws_fwd(cfg, xs, scales, biases, band, wplus, wminus):
    y, s1, s2 = _run_impl_ws(cfg, xs, scales, biases, band, wplus,
                             wminus)
    # y is saved for the stats cotangent (gs2 needs 2*y) — it is the
    # op's own output, alive downstream anyway, so XLA shares the
    # buffer: no extra HBM.
    return (y, s1, s2), (xs, scales, biases, band, wplus, wminus, y)


def _fused_ws_bwd(cfg, res, gs):
    xs, scales, biases, band, wplus, wminus = res[:6]
    y = res[6]
    gy, gs1, gs2 = gs
    res0 = (xs, scales, biases, band, wplus, wminus)
    kY = cfg[0]
    if _use_pallas_impl(cfg[7]):
        if kY == 1:
            # zero-materialization path: the dx/dband kernels fold
            # g_total = gy + gs1 + 2*y*gs2 in their prologues (y rides
            # along as one extra slab read; saves the full g_total
            # write + build reads).
            return _fused_bwd_impl(cfg, res0, gy,
                                   stats_cot=(y, gs1, gs2))
        # kY>1: the dx kernel reads kY neighbour g-slabs — folding
        # in-kernel would read kY y-slabs too (net worse); pre-fold.
    gt = (gy.astype(jnp.float32) + gs1.reshape(-1)
          + 2.0 * y.astype(jnp.float32) * gs2.reshape(-1)
          ).astype(gy.dtype)
    return _fused_bwd_impl(cfg, res0, gt)


_fused_op_ws.defvjp(_fused_ws_fwd, _fused_ws_bwd)


def fused_conv(xs, scales, biases, w, X: int, nb: int, bs: int,
               relu: bool = True, preferred_element_type=jnp.float32,
               impl: str = "auto", out_stats: bool = False):
    """Differentiable fused affine+ReLU+conv on the thick layout.

    ``impl``: 'pallas' (TPU kernel), 'ref' (pure XLA), 'auto' (pallas on
    TPU backends, ref elsewhere).

    ``out_stats``: additionally return the output's per-lane (1, bs*co)
    fp32 (sum, sum-of-squares) — fused into the kernel epilogue, saving
    the separate interior_stats read; the backward folds the stats
    cotangent into the dx/dband kernel prologues (kY==1).
    """
    kY, kX, kz, ci, co = w.shape
    band, wplus, wminus = _band_wrap_matrices(w, bs)
    cfg = (kY, kX, X, nb, bs, bool(relu),
           jnp.dtype(preferred_element_type).name, impl,
           (bs - 1, 0), (0, bs - 1))
    if _SPACE is not None:
        y = _fused_op_sharded(cfg, tuple(xs), tuple(scales),
                              tuple(biases), band, wplus, wminus)
        if out_stats:
            s1, s2 = _stats_of(y)
            return y, s1, s2
        return y
    if out_stats:
        return _fused_op_ws(cfg, tuple(xs), tuple(scales),
                            tuple(biases), band, wplus, wminus)
    return _fused_op(cfg, tuple(xs), tuple(scales), tuple(biases),
                     band, wplus, wminus)


def fused_conv_dyn(xs, scales, biases, w, X: int, nb: int, bs: int,
                   dyn_extents, relu: bool = True,
                   preferred_element_type=jnp.float32,
                   impl: str = "auto") -> jnp.ndarray:
    """EVAL-ONLY fused conv under exact bucketing: the kernel prologue
    re-zeroes the affine output beyond the dynamic true extents
    (yt, xt, zt), so the fused path reproduces the per-op masked path
    bit-for-bit on the valid region (tests/test_exact_bucketing.py).
    No custom VJP — differentiating through it is unsupported (the
    training path never buckets)."""
    assert _SPACE is None, "dynamic extents not supported under a mesh"
    kY, kX, kz, ci, co = w.shape
    band, wplus, wminus = _band_wrap_matrices(w.astype(xs[0].dtype), bs)
    pet = jnp.dtype(preferred_element_type).type
    if _use_pallas_impl(impl):
        return _fused_conv_pallas_mats(
            list(xs), list(scales), list(biases), band, wplus, wminus,
            kY, kX, X, nb, bs, relu, pet, interpret=_INTERPRET,
            dyn_extents=dyn_extents)
    return _fused_conv_ref_mats(
        list(xs), list(scales), list(biases), band, wplus, wminus,
        kY, kX, X, nb, bs, relu, pet, dyn_extents=dyn_extents)


# ---------------------------------------------------------------------------
# Eval-mode 2-conv mega-kernel (round 4, PERF.md roadmap 3)
# ---------------------------------------------------------------------------
#
# In eval the BatchNorm affines come from RUNNING stats (parameters), so
# consecutive kY==1 convs of a ConvX chain have no inter-conv reduction:
# both run in ONE kernel with the intermediate resident in VMEM,
# deleting its HBM write+read (per stage-1 pair that is two full passes
# over a ~260 MB buffer).  Training cannot use this (conv i's output
# batch-stats gate conv i+1's prologue affine).

def _conv_taps(t, band_ref, wrap_ref, kX, kz, nb, RX, bs, mrow, rows_i):
    """The tap-accumulation core of `_kernel` for a kY==1 conv: returns
    the fp32 raw conv of the activated slab ``t``."""
    tap_row_m = {0: rows_i >= nb, 1: None, 2: rows_i < RX - nb}
    if kz == 3:
        CCo = band_ref.shape[-1]
        co = CCo // bs
        col = jax.lax.broadcasted_iota(jnp.int32, (RX, CCo), 1)
        head_cols = jnp.logical_and(mrow != 0, col < co)
        tail_cols = jnp.logical_and(mrow != nb - 1,
                                    col >= (bs - 1) * co)
    acc = None
    for dx in range(kX):
        rows = _roll_rows(t, ((1 - dx) * nb) % RX) if kX == 3 else t
        a = jax.lax.dot_general(
            rows, band_ref[dx],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if kz == 3:
            p = jax.lax.dot_general(
                rows, wrap_ref[dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a = a + jnp.where(head_cols, _roll_rows(p, 1), 0.0)
            a = a + jnp.where(tail_cols, _roll_rows(p, RX - 1), 0.0)
        if kX == 3 and tap_row_m[dx] is not None:
            a = jnp.where(tap_row_m[dx], a, 0.0)
        acc = a if acc is None else acc + a
    return acc


def _dyn_valid_in_kernel(ext_ref, rows_i, mrow, nb, bs, ci):
    xt = ext_ref[1]
    zt = ext_ref[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bs * ci), 1)
    zslot = mrow * bs + lane // ci
    return jnp.logical_and(
        rows_i // nb < xt,   # mosaic-f32-ok: int32 compare
        zslot < zt)          # mosaic-f32-ok: int32 compare


def _kernel2(*refs, kX0: int, kz0: int, kX1: int, kz1: int,
             X: int, nb: int, bs: int, relu0: bool, out_dtype,
             with_dyn: bool = False):
    # operands: x slab; s0, b0; s_mid, b_mid; [ext;] bandA [, wrapA];
    # bandB [, wrapB]; out.
    idx = 0
    x_ref = refs[idx]; idx += 1
    s0_ref, b0_ref = refs[idx], refs[idx + 1]; idx += 2
    sm_ref, bm_ref = refs[idx], refs[idx + 1]; idx += 2
    if with_dyn:
        ext_ref = refs[idx]; idx += 1
    bandA_ref = refs[idx]; idx += 1
    if kz0 == 3:
        wrapA_ref = refs[idx]; idx += 1
    else:
        wrapA_ref = None
    bandB_ref = refs[idx]; idx += 1
    if kz1 == 3:
        wrapB_ref = refs[idx]; idx += 1
    else:
        wrapB_ref = None
    out_ref = refs[idx]

    y = pl.program_id(1)
    RX = X * nb
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (RX, 1), 0)
    mrow = jax.lax.rem(rows_i, nb)

    # conv A prologue + taps
    t0 = x_ref[0, 0] * s0_ref[:] + b0_ref[:]
    if relu0:
        t0 = jnp.maximum(t0, 0.0)
    if with_dyn:
        ci0 = x_ref.shape[-1] // bs
        v0 = _dyn_valid_in_kernel(ext_ref, rows_i, mrow, nb, bs, ci0)
        t0 = jnp.where(v0, t0, jnp.zeros((), t0.dtype))
        yv = (y < ext_ref[0])  # mosaic-f32-ok: int32 scalar
        t0 = t0 * yv.astype(t0.dtype)
    y1 = _conv_taps(t0, bandA_ref, wrapA_ref, kX0, kz0, nb, RX, bs,
                    mrow, rows_i)

    # mid affine + ReLU on the VMEM-resident intermediate, then conv B
    t1 = (y1.astype(out_dtype) * sm_ref[:] + bm_ref[:]).astype(
        x_ref.dtype)
    t1 = jnp.maximum(t1, 0.0)
    if with_dyn:
        ci1 = bandA_ref.shape[-1] // bs
        v1 = _dyn_valid_in_kernel(ext_ref, rows_i, mrow, nb, bs, ci1)
        t1 = jnp.where(v1, t1, jnp.zeros((), t1.dtype))
        t1 = t1 * yv.astype(t1.dtype)  # mid bias garbage on invalid y
    y2 = _conv_taps(t1, bandB_ref, wrapB_ref, kX1, kz1, nb, RX, bs,
                    mrow, rows_i)
    out_ref[0, 0] = y2.astype(out_dtype)


def fused_conv2_eval(x, s0, b0, w0, s_mid, b_mid, w1, X: int, nb: int,
                     bs: int, relu0: bool = False,
                     preferred_element_type=jnp.float32,
                     impl: str = "auto", dyn_extents=None) -> jnp.ndarray:
    """EVAL-ONLY: two consecutive stride-1 SAME kY==1 convs in one
    kernel — ``conv_B(relu(mid_affine(conv_A(relu0?(affine0(x))))))``
    with the intermediate VMEM-resident.  ``s0``/``b0`` may be None
    (identity); the mid affine (folded BN of conv A, from RUNNING
    stats) is mandatory.  No custom VJP (training keeps per-conv
    kernels: conv A's batch stats gate the mid affine there)."""
    assert _SPACE is None, "fused_conv2_eval not supported under a mesh"
    kY0, kX0, kz0, ci0, co0 = w0.shape
    kY1, kX1, kz1, ci1, co1 = w1.shape
    assert kY0 == 1 and kY1 == 1 and ci1 == co0, (w0.shape, w1.shape)
    dt = x.dtype
    pet = jnp.dtype(preferred_element_type).type
    bandA, wplusA, wminusA = _band_wrap_matrices(w0.astype(dt), bs)
    bandB, wplusB, wminusB = _band_wrap_matrices(w1.astype(dt), bs)

    if not _use_pallas_impl(impl):
        y1 = _fused_conv_ref_mats(
            [x], [s0], [b0], bandA, wplusA, wminusA, 1, kX0, X, nb, bs,
            relu0, pet, dyn_extents=dyn_extents)
        return _fused_conv_ref_mats(
            [y1], [s_mid], [b_mid], bandB, wplusB, wminusB, 1, kX1, X,
            nb, bs, True, pet, dyn_extents=dyn_extents)

    B, Y, RX, CC = x.shape
    ops = [x]
    in_specs = [pl.BlockSpec((1, 1, RX, CC), lambda b, y: (b, y, 0, 0),
                             memory_space=pltpu.VMEM)]
    vec_spec = lambda n: pl.BlockSpec((1, n), lambda b, y: (0, 0),
                                      memory_space=pltpu.VMEM)
    ops.append(jnp.ones((1, CC), dt) if s0 is None
               else s0.astype(dt).reshape(1, CC))
    ops.append(jnp.zeros((1, CC), dt) if b0 is None
               else b0.astype(dt).reshape(1, CC))
    in_specs += [vec_spec(CC)] * 2
    CCm = bs * co0
    ops.append(s_mid.astype(dt).reshape(1, CCm))
    ops.append(b_mid.astype(dt).reshape(1, CCm))
    in_specs += [vec_spec(CCm)] * 2
    if dyn_extents is not None:
        yt, xt, zt = dyn_extents
        ops.append(jnp.stack([jnp.asarray(yt, jnp.int32),
                              jnp.asarray(xt, jnp.int32),
                              jnp.asarray(zt, jnp.int32)]))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    def mats(band, wplus, wminus, kz):
        o = [band.astype(dt)]
        if kz == 3:
            o.append((wplus + wminus).astype(dt))
        return o

    for m in mats(bandA, wplusA, wminusA, kz0):
        ops.append(m)
        in_specs.append(pl.BlockSpec(m.shape, lambda b, y: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    for m in mats(bandB, wplusB, wminusB, kz1):
        ops.append(m)
        in_specs.append(pl.BlockSpec(m.shape, lambda b, y: (0, 0, 0),
                                     memory_space=pltpu.VMEM))

    kern = functools.partial(
        _kernel2, kX0=kX0, kz0=kz0, kX1=kX1, kz1=kz1, X=X, nb=nb, bs=bs,
        relu0=relu0, out_dtype=pet, with_dyn=dyn_extents is not None)
    return pl.pallas_call(
        kern,
        grid=(B, Y),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, RX, bs * co1),
                               lambda b, y: (b, y, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Y, RX, bs * co1), pet),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=_INTERPRET,
    )(*ops)


# ---------------------------------------------------------------------------
# Eval-mode whole-block chain kernel (round 4, beyond PERF.md roadmap 3)
# ---------------------------------------------------------------------------
#
# In eval EVERY BN affine comes from running stats (parameters), so an
# entire ConvX block — all convs, the 1x1 downsample residual and the
# final ReLU (reference ``models/fpn/unets3D.py:187-219``) — is a pure
# per-position function of a (G+2)-row window of the input: ONE kernel
# reads x once and writes the block output once; every intermediate
# stays in VMEM.  The trailing (3,1,1) conv uses the Y-chunk structure
# (main block + single-row halos); at most one kY==3 conv is supported.
# Training cannot use this (each conv's batch stats gate the next
# affine).  Gated by MMF_FUSED_CHAIN (default off until the Mosaic
# compile is verified on chip — tools/onchip_r4.py).

def _chain_kernel(*refs, n_conv: int, kYs, kXs, kzs, G: int, halo: int,
                  nb: int, bs: int, relu0: bool, final: str, out_dtype,
                  x_dtype, with_dyn: bool):
    # operands: x main (1,G,RX,CC) [, x top, x bot when halo]; s_in,
    # b_in; per conv j: band_j [, wrap_j when kz==3], s_j, b_j;
    # [ds_band, sd, bd when final=='res_conv';] [ext when with_dyn;]
    # out (1,G,RX,CCo).
    idx = 0
    x_main = refs[idx]; idx += 1
    if halo:
        x_top = refs[idx]; x_bot = refs[idx + 1]; idx += 2
    s_in, b_in = refs[idx], refs[idx + 1]; idx += 2
    conv_refs = []
    for j in range(n_conv):
        band = refs[idx]; idx += 1
        wrap = None
        if kzs[j] == 3:
            wrap = refs[idx]; idx += 1
        s_j, b_j = refs[idx], refs[idx + 1]; idx += 2
        conv_refs.append((band, wrap, s_j, b_j))
    if final == "res_conv":
        ds_band, sd_ref, bd_ref = refs[idx], refs[idx + 1], refs[idx + 2]
        idx += 3
    if with_dyn:
        ext_ref = refs[idx]; idx += 1
    out_ref = refs[idx]

    c = pl.program_id(1)
    nch = pl.num_programs(1)
    RX = x_main.shape[-2]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (RX, 1), 0)
    mrow = jax.lax.rem(rows_i, nb)

    def dyn_mask(CC_w):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CC_w), 1)
        zslot = mrow * bs + lane // (CC_w // bs)
        return jnp.logical_and(
            rows_i // nb < ext_ref[1],  # mosaic-f32-ok: int32 compare
            zslot < ext_ref[2])         # mosaic-f32-ok: int32 compare

    def y_valid(off):
        yg = c * G + off
        return jnp.logical_and(
            yg >= 0,
            yg < ext_ref[0])  # mosaic-f32-ok: int32 scalar

    # entry rows: affine(+relu0), true-edge halos zeroed
    offs = list(range(-halo, G + halo))
    if with_dyn:
        m_in = dyn_mask(x_main.shape[-1])
    rows = []
    for off in offs:
        xv = x_main[0, off] if 0 <= off < G else (
            x_top[0, 0] if off < 0 else x_bot[0, 0])
        t = xv * s_in[:] + b_in[:]
        if relu0:
            t = jnp.maximum(t, 0.0)
        if with_dyn:
            t = jnp.where(m_in, t, jnp.zeros((), t.dtype))
            t = t * y_valid(off).astype(t.dtype)
        elif off < 0:
            t = t * (c > 0).astype(t.dtype)
        elif off >= G:
            t = t * (c < nch - 1).astype(t.dtype)
        rows.append(t)

    for j in range(n_conv):
        band, wrap, s_j, b_j = conv_refs[j]
        if kYs[j] == 1:
            new = [_conv_taps(t, band, wrap, kXs[j], kzs[j], nb, RX,
                              bs, mrow, rows_i) for t in rows]
        else:
            # the single kY==3 conv consumes the halo rows:
            # out[g] = sum_dy rows[g + dy - 1] @ band[dy]
            assert kXs[j] == 1 and kzs[j] == 1 and len(rows) == G + 2
            new = []
            for g in range(G):
                acc = None
                for dy in range(3):
                    a = jax.lax.dot_general(
                        rows[g + dy], band[dy],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = a if acc is None else acc + a
                new.append(acc)
            offs = list(range(G))
        if j == n_conv - 1:
            # final affine in the materialization dtype (bit-parity
            # with the per-op path's HBM round trip)
            outs = [(a.astype(out_dtype) * s_j[:]
                     + b_j[:]).astype(x_dtype) for a in new]
        else:
            if with_dyn:
                m_mid = dyn_mask(band.shape[-1])
            rows = []
            for a, off in zip(new, offs):
                t = (a.astype(out_dtype) * s_j[:]
                     + b_j[:]).astype(x_dtype)
                t = jnp.maximum(t, 0.0)
                if with_dyn:
                    t = jnp.where(m_mid, t, jnp.zeros((), t.dtype))
                    t = t * y_valid(off).astype(t.dtype)
                elif off < 0:
                    # the affine bias re-pollutes the zeroed true-edge
                    # halo rows; the downstream kY==3 conv must see
                    # SAME-pad zeros there
                    t = t * (c > 0).astype(t.dtype)
                elif off >= G:
                    t = t * (c < nch - 1).astype(t.dtype)
                rows.append(t)

    for g in range(G):
        o = outs[g]
        if final == "res_id":
            o = o + x_main[0, g]
        elif final == "res_conv":
            yd = jax.lax.dot_general(
                x_main[0, g], ds_band[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x_dtype)
            o = o + yd * sd_ref[:] + bd_ref[:]
        if final != "affine":
            o = jnp.maximum(o, 0.0)
        out_ref[0, g] = o.astype(out_dtype)


def fused_chain_eval(x, s_in, b_in, relu0, convs, final, ds, X: int,
                     nb: int, bs: int,
                     preferred_element_type=jnp.float32,
                     impl: str = "auto", dyn_extents=None):
    """EVAL-ONLY whole-block fused chain on the thick layout.

    ``convs``: sequence of (w, s_post, b_post) — logical (kY,kX,kz,ci,
    co) weights with every tap in {1,3} (at most ONE kY==3 conv), each
    followed by its folded-BN affine (bs-tiled (bs*co,) vectors).
    ``final``: 'affine' (emit last affine raw — caller continues),
    'relu', 'res_id' (+x identity residual), 'res_conv' (+1x1
    downsample residual, ``ds`` = (w_ds, sd, bd)).  ``s_in``/``b_in``/
    ``relu0``: prologue of the first conv (mid-block chain entry).
    No custom VJP — eval only (training has per-conv BN barriers)."""
    assert _SPACE is None, "fused_chain_eval not supported under a mesh"
    assert final in ("affine", "relu", "res_id", "res_conv"), final
    dt = x.dtype
    pet = jnp.dtype(preferred_element_type).type
    B, Y, RX, CC = x.shape

    mats = []
    for w, s_post, b_post in convs:
        kY, kX, kz, ci, co = w.shape
        band, wplus, wminus = _band_wrap_matrices(w.astype(dt), bs)
        mats.append((band, wplus, wminus, kY, kX, kz, s_post, b_post))
    kYs = [m[3] for m in mats]
    assert sum(1 for k in kYs if k == 3) <= 1, kYs
    if final == "res_conv":
        w_ds, sd, bd = ds
        ds_band, _, _ = _band_wrap_matrices(w_ds.astype(dt), bs)

    if not _use_pallas_impl(impl):
        # per-op composition (bit-identical to the unfused eval path)
        cur, cs, cb, crelu = x, s_in, b_in, relu0
        for band, wplus, wminus, kY, kX, kz, s_post, b_post in mats:
            cur = _fused_conv_ref_mats(
                [cur], [cs], [cb], band, wplus, wminus, kY, kX, X, nb,
                bs, crelu, dt, dyn_extents=dyn_extents)
            cs, cb, crelu = s_post, b_post, True
        out = cur * mats[-1][6].astype(dt) + mats[-1][7].astype(dt)
        if final == "res_id":
            out = out + x
        elif final == "res_conv":
            yd = _fused_conv_ref_mats(
                [x], [None], [None], ds_band, None, None, 1, 1, X, nb,
                bs, False, dt, dyn_extents=dyn_extents)
            out = out + yd * sd.astype(dt) + bd.astype(dt)
        if final != "affine":
            out = jnp.maximum(out, 0.0)
        return out.astype(pet)

    halo = 1 if 3 in kYs else 0
    wide = max([CC] + [m[0].shape[-1] for m in mats])
    G = _ychunk_G(Y, RX, wide, dt.itemsize) or 1
    assert Y % G == 0, (Y, G)  # _ychunk_G only returns divisors of Y

    ops = [x]
    in_specs = [pl.BlockSpec((1, G, RX, CC), lambda b, c: (b, c, 0, 0),
                             memory_space=pltpu.VMEM)]
    if halo:
        in_specs.append(pl.BlockSpec(
            (1, 1, RX, CC),
            lambda b, c: (b, jnp.maximum(c * G - 1, 0), 0, 0),
            memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (1, 1, RX, CC),
            lambda b, c: (b, jnp.minimum(c * G + G, Y - 1), 0, 0),
            memory_space=pltpu.VMEM))
        ops += [x, x]
    ops.append(jnp.ones((1, CC), dt) if s_in is None
               else s_in.astype(dt).reshape(1, CC))
    ops.append(jnp.zeros((1, CC), dt) if b_in is None
               else b_in.astype(dt).reshape(1, CC))
    vspec = lambda n: pl.BlockSpec((1, n), lambda b, c: (0, 0),
                                   memory_space=pltpu.VMEM)
    in_specs += [vspec(CC)] * 2
    mspec = lambda m: pl.BlockSpec(m.shape, lambda b, c: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
    kXs, kzs = [], []
    for band, wplus, wminus, kY, kX, kz, s_post, b_post in mats:
        ops.append(band.astype(dt))
        in_specs.append(mspec(band))
        if kz == 3:
            ops.append((wplus + wminus).astype(dt))
            in_specs.append(mspec(band))
        CCn = band.shape[-1]
        ops.append(s_post.astype(dt).reshape(1, CCn))
        ops.append(b_post.astype(dt).reshape(1, CCn))
        in_specs += [vspec(CCn)] * 2
        kXs.append(kX)
        kzs.append(kz)
    if final == "res_conv":
        ops.append(ds_band.astype(dt))
        in_specs.append(mspec(ds_band))
        CCd = ds_band.shape[-1]
        ops.append(sd.astype(dt).reshape(1, CCd))
        ops.append(bd.astype(dt).reshape(1, CCd))
        in_specs += [vspec(CCd)] * 2
    if dyn_extents is not None:
        yt, xt, zt = dyn_extents
        ops.append(jnp.stack([jnp.asarray(yt, jnp.int32),
                              jnp.asarray(xt, jnp.int32),
                              jnp.asarray(zt, jnp.int32)]))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    CCo = mats[-1][0].shape[-1]
    kern = functools.partial(
        _chain_kernel, n_conv=len(mats), kYs=tuple(kYs),
        kXs=tuple(kXs), kzs=tuple(kzs), G=G, halo=halo, nb=nb, bs=bs,
        relu0=relu0, final=final, out_dtype=pet, x_dtype=dt,
        with_dyn=dyn_extents is not None)
    return pl.pallas_call(
        kern,
        grid=(B, Y // G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G, RX, CCo),
                               lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Y, RX, CCo), pet),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=_INTERPRET,
    )(*ops)


def interior_stats(y_raw: jnp.ndarray, X: int, nb: int, bs: int,
                   n_batch: int, n_y: int):
    """Per-logical-channel (mean, var) of a raw thick-layout output
    (padless: every row is real data, plain sums over everything)."""
    co = y_raw.shape[-1] // bs
    n = n_batch * n_y * X * nb * bs
    y2 = y_raw.astype(jnp.float32).reshape(-1, bs, co)
    s1 = jnp.sum(y2, axis=(0, 1))
    s2 = jnp.sum(jnp.square(y2), axis=(0, 1))
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    return mean, var


# --------------------------------------------------------------------------
# Strided (projection-cascade) variant
# --------------------------------------------------------------------------
#
# The zdimRed cascades are stride-2 (1,1,3) convs (reference
# unets3D.py:356-437).  On the thick layout a stride-2 z-conv is STILL
# one band matrix: input slots j_in < valid_in of block m hold
# z = m*valid_in + j_in; the output lives in slots j_out < valid_in//2
# with z' = m*valid_out + j_out, reading z_in = 2*j_out + dz - 1 —
# in-block except j_out=0, dz=0 which reads the PREVIOUS block's slot
# valid_in-1 (a wplus-style head roll).  The generic kernel and custom
# VJP apply unchanged; only the matrices differ.

def _band_wrap_strided(w: jnp.ndarray, bs: int, valid_in: int):
    """w: (1, 1, kz, ci, co), kz in {1, 3}, stride 2, SAME pad kz//2.
    Returns (band, wplus, wminus) of shape (1, bs*ci, bs*co); output
    slots j >= valid_in//2 stay structurally zero."""
    kY, kX, kz, ci, co = w.shape
    assert kY == kX == 1 and valid_in >= 2, (w.shape, valid_in)
    valid_out = valid_in // 2
    wt = w.reshape(kz, ci, co)
    sel = np.zeros((kz, bs, bs), np.float32)
    for dz in range(kz):
        for j_out in range(valid_out):
            j_in = 2 * j_out + dz - kz // 2
            if 0 <= j_in < valid_in:
                sel[dz, j_in, j_out] = 1.0
    band = jnp.einsum("dio,djk->jiko", wt, jnp.asarray(sel, w.dtype))
    band = band.reshape(1, bs * ci, bs * co)
    if kz == 1:
        return band, None, None
    # j_out = 0, dz = 0 reads z_in = -1: previous block's slot valid_in-1
    zp = np.zeros((bs, bs), np.float32)
    zp[valid_in - 1, 0] = 1.0
    wplus = jnp.einsum("io,jk->jiko", wt[0],
                       jnp.asarray(zp, w.dtype)).reshape(band.shape)
    return band, wplus, jnp.zeros_like(band)


def fused_conv_strided(xs, scales, biases, w, X: int, nb: int, bs: int,
                       valid_in: int, relu: bool = True,
                       preferred_element_type=jnp.float32,
                       impl: str = "auto", out_stats: bool = False):
    """Differentiable stride-2 z-conv on the padded thick layout (slots
    j >= valid_in are ignored on input; output occupies j < valid_in//2).

    ``out_stats``: also return per-lane (sum, sum^2) of the output —
    structural-zero slots contribute nothing, so the sums are exact;
    the caller divides by the true count (as interior_stats_slots does).
    """
    band, wplus, wminus = _band_wrap_strided(w, bs, valid_in)
    cfg = (1, 1, X, nb, bs, bool(relu),
           jnp.dtype(preferred_element_type).name, impl,
           (valid_in - 1, 0), (0, bs - 1))
    if _SPACE is not None:
        y = _fused_op_sharded(cfg, tuple(xs), tuple(scales),
                              tuple(biases), band, wplus, wminus)
        if out_stats:
            s1, s2 = _stats_of(y)
            return y, s1, s2
        return y
    if out_stats:
        return _fused_op_ws(cfg, tuple(xs), tuple(scales),
                            tuple(biases), band, wplus, wminus)
    return _fused_op(cfg, tuple(xs), tuple(scales), tuple(biases),
                     band, wplus, wminus)


def fused_conv_strided_dyn(xs, scales, biases, w, X: int, nb: int,
                           bs: int, valid_in: int, dyn_extents,
                           relu: bool = True,
                           preferred_element_type=jnp.float32,
                           impl: str = "auto") -> jnp.ndarray:
    """EVAL-ONLY strided cascade conv under exact bucketing: like
    :func:`fused_conv_strided` but the prologue re-zeroes beyond the
    dynamic (yt, xt, zt) true extents (logical z = m*valid_in + j on
    the slot-sparse layout).  No custom VJP."""
    assert _SPACE is None, "dynamic extents not supported under a mesh"
    band, wplus, wminus = _band_wrap_strided(w, bs, valid_in)
    pet = jnp.dtype(preferred_element_type).type
    if _use_pallas_impl(impl):
        return _fused_conv_pallas_mats(
            list(xs), list(scales), list(biases), band, wplus, wminus,
            1, 1, X, nb, bs, relu, pet, interpret=_INTERPRET,
            dyn_extents=dyn_extents, dyn_valid_in=valid_in)
    return _fused_conv_ref_mats(
        list(xs), list(scales), list(biases), band, wplus, wminus,
        1, 1, X, nb, bs, relu, pet, dyn_extents=dyn_extents,
        dyn_valid_in=valid_in)


def unpack_slots(xp: jnp.ndarray, X: int, nb: int, bs: int,
                 valid: int) -> jnp.ndarray:
    """Compact a slot-sparse thick buffer to (B, Y, X, nb*valid, C)."""
    B, Y, RX, CC = xp.shape
    co = CC // bs
    xt = xp.reshape(B, Y, RX, bs, co)[:, :, :, :valid]
    return xt.reshape(B, Y, X, nb * valid, co)


def merge_slots(xp: jnp.ndarray, X: int, nb: int, bs: int,
                valid: int) -> jnp.ndarray:
    """Re-densify a slot-sparse thick buffer by merging block PAIRS:
    (nb blocks, ``valid`` of ``bs`` slots live) -> (nb//2 blocks,
    2*valid dense slots).  Requires nb even.  z order is preserved:
    z' = m*valid + j  ->  block m//2, slot (m%2)*valid + j.

    One sliced copy of the LIVE data (half the buffer when
    valid = bs/2) + free reshapes — this is what keeps the strided
    projection cascade's later levels dense instead of paying
    full-width dots on slot-sparse buffers (the round-2 measured loss
    of the all-fused cascade, PERF.md)."""
    assert nb % 2 == 0, nb
    B, Y, RX, CC = xp.shape
    co = CC // bs
    xt = xp.reshape(B, Y, RX, bs, co)[:, :, :, :valid]
    return xt.reshape(B, Y, X * (nb // 2), 2 * valid * co)


def interior_stats_slots(y_raw: jnp.ndarray, X: int, nb: int, bs: int,
                         valid: int, n_batch: int, n_y: int):
    """Per-channel (mean, var) when only slots j < valid are populated
    (the other slots are structural zeros: sums are exact, only the
    divisor uses the true count)."""
    co = y_raw.shape[-1] // bs
    n = n_batch * n_y * X * nb * valid
    y2 = y_raw.astype(jnp.float32).reshape(-1, bs, co)
    s1 = jnp.sum(y2, axis=(0, 1))
    s2 = jnp.sum(jnp.square(y2), axis=(0, 1))
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    return mean, var


# --------------------------------------------------------------------------
# Pallas dband kernel — the band-matrix cotangent of the fused conv
# --------------------------------------------------------------------------
#
# The backward's dominant cost is dband[tap] = sum_r t[r+shift]^T g[r]:
# XLA re-reads the shifted operands per tap (measured 5.3 ms per s1
# conv); this kernel recomputes t from the saved inputs, reads each
# slab once, applies the shifts as in-VMEM rolls (pad rows are zero so
# rolls equal shifts) and accumulates all taps into a VMEM-resident
# (T, CC, CCo) output across the sequential grid.

def _dband_kernel(*refs, n_in: int, kY: int, kX: int,
                  X: int, nb: int, bs: int, relu: bool, Y: int,
                  want_wrap: bool, with_gstats: bool = False):
    idx = 0
    x_refs = []
    for _ in range(n_in):
        x_refs.append([refs[idx + d] for d in range(kY)])
        idx += kY
    sb_refs = []
    for _ in range(n_in):
        sb_refs.append((refs[idx], refs[idx + 1]))
        idx += 2
    g_ref = refs[idx]; idx += 1
    if with_gstats:
        yst_ref = refs[idx]; idx += 1
        gs1_ref = refs[idx]; idx += 1
        gs2_ref = refs[idx]; idx += 1
    out_ref = refs[idx]; idx += 1
    if want_wrap:
        wp_ref = refs[idx]; idx += 1
        wm_ref = refs[idx]; idx += 1

    y = pl.program_id(1)
    step = pl.program_id(0) * pl.num_programs(1) + y
    RX = X * nb

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (RX, 1), 0)
    mrow = jax.lax.rem(rows_i, nb)
    # per-tap X-boundary masks for the padless layout (a roll by ±nb
    # wraps real rows from the opposite X edge)
    tap_row_m = {0: rows_i >= nb, 1: None, 2: rows_i < RX - nb}

    gm = g_ref[0, 0]
    if with_gstats:
        # fold g_total = g + gs1 + 2*y*gs2 on the resident slab (the
        # dband kernel only ever reads the CENTER g slab, so this works
        # for any kY).
        yf = yst_ref[0, 0].astype(jnp.float32)
        gm = (gm.astype(jnp.float32) + gs1_ref[:]
              + 2.0 * yf * gs2_ref[:]).astype(gm.dtype)
    if want_wrap:
        head_m = mrow != 0
        tail_m = mrow != nb - 1
        # fwd head term: out[r] += head_m[r]*(rows@Wplus)[r-1]
        #   => dWplus = sum_r rows[r]^T (head_m*gm)[r+1]
        hgr = _roll_rows(jnp.where(head_m, gm, 0.0), RX - 1)
        tgr = _roll_rows(jnp.where(tail_m, gm, 0.0), 1)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        if want_wrap:
            wp_ref[...] = jnp.zeros_like(wp_ref)
            wm_ref[...] = jnp.zeros_like(wm_ref)

    for dy in range(kY):
        t = None
        for i in range(n_in):
            xv = x_refs[i][dy][0, 0]
            s_ref, b_ref = sb_refs[i]
            term = xv * s_ref[:] + b_ref[:]
            t = term if t is None else t + term
        if relu:
            t = jnp.maximum(t, 0.0)
        if kY > 1:
            yy = y + dy - kY // 2
            vmask = jnp.logical_and(yy >= 0, yy < Y).astype(jnp.float32)
            t = t * vmask.astype(t.dtype)
        for dx in range(kX):
            tap = dy * kX + dx
            # dband[tap] = sum_r t[r + (dx-1)*nb]^T gm[r]; rows whose
            # source crossed the X boundary are masked per tap.
            rows = _roll_rows(t, (-(dx - kX // 2) * nb) % RX) \
                if kX == 3 else t
            if kX == 3 and tap_row_m[dx] is not None:
                rows = jnp.where(tap_row_m[dx], rows, 0.0)
            dn = (((0,), (0,)), ((), ()))
            out_ref[tap] += jax.lax.dot_general(
                rows, gm, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            if want_wrap:
                wp_ref[tap] += jax.lax.dot_general(
                    rows, hgr, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                wm_ref[tap] += jax.lax.dot_general(
                    rows, tgr, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)


def _dband_pallas(xs, scales, biases, g, kY: int, kX: int,
                  X: int, nb: int, bs: int, relu: bool,
                  want_wrap: bool = False, interpret: bool = False,
                  stats_cot=None):
    """(kY*kX, CC, CCo) band cotangent via the accumulating kernel;
    with ``want_wrap`` also the (full, unprojected) wplus/wminus
    cotangents — the weight-expansion pullback outside the custom-VJP
    boundary projects onto the structural entries, so full dense
    cotangents are exactly correct."""
    n_in = len(xs)
    B, Y, RX, CC = xs[0].shape
    CCo = g.shape[-1]
    dt = xs[0].dtype

    if (kY == 3 and kX == 1 and not want_wrap and stats_cot is None):
        # (3,1,1) dband: chunk the kY x-slab reads (3x -> 1+2/G).
        G = _ychunk_G(Y, RX, max(CC, CCo), dt.itemsize)
        if G:
            return _dband_pallas_yck(xs, scales, biases, g, G, relu,
                                     interpret)

    ops = []
    in_specs = []
    for i in range(n_in):
        for dy in range(kY):
            off = dy - kY // 2
            ops.append(xs[i])
            in_specs.append(pl.BlockSpec(
                (1, 1, RX, CC),
                lambda b, y, off=off: (b, jnp.clip(y + off, 0, Y - 1),
                                       0, 0),
                memory_space=pltpu.VMEM))
    for i in range(n_in):
        s = scales[i]
        b = biases[i]
        ops.append(jnp.ones((1, CC), dt) if s is None
                   else s.astype(dt).reshape(1, CC))
        ops.append(jnp.zeros((1, CC), dt) if b is None
                   else b.astype(dt).reshape(1, CC))
        in_specs += [pl.BlockSpec((1, CC), lambda b, y: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    ops.append(g.astype(dt))
    in_specs.append(pl.BlockSpec((1, 1, RX, CCo),
                                 lambda b, y: (b, y, 0, 0),
                                 memory_space=pltpu.VMEM))
    if stats_cot is not None:
        y_out, gs1, gs2 = stats_cot
        ops.append(y_out)
        in_specs.append(pl.BlockSpec((1, 1, RX, CCo),
                                     lambda b, y: (b, y, 0, 0),
                                     memory_space=pltpu.VMEM))
        for v in (gs1, gs2):
            ops.append(v.astype(jnp.float32).reshape(1, CCo))
            in_specs.append(pl.BlockSpec((1, CCo), lambda b, y: (0, 0),
                                         memory_space=pltpu.VMEM))

    kern = functools.partial(_dband_kernel, n_in=n_in, kY=kY, kX=kX,
                             X=X, nb=nb, bs=bs, relu=relu, Y=Y,
                             want_wrap=want_wrap,
                             with_gstats=stats_cot is not None)
    nt = kY * kX
    o_spec = pl.BlockSpec((nt, CC, CCo), lambda b, y: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct((nt, CC, CCo), jnp.float32)
    n_out = 3 if want_wrap else 1
    out = pl.pallas_call(
        kern,
        grid=(B, Y),
        in_specs=in_specs,
        out_specs=(o_spec,) * n_out if want_wrap else o_spec,
        out_shape=(o_shape,) * n_out if want_wrap else o_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(*ops)
    return out


# --------------------------------------------------------------------------
# Pallas dx kernel — transposed conv + the whole input-side epilogue
# --------------------------------------------------------------------------
#
# The input cotangent chain is  dt = conv_T(g);  dtm = dt * relu_mask;
# dx_i = dtm * s_i;  ds_i = sum dtm * x_i;  db_i = sum dtm.  Running the
# epilogue in XLA costs ~4-5 full-buffer passes per conv; this kernel
# computes the transposed conv (same dot/roll structure, flipped
# matrices from _mats_T) and the epilogue on resident slabs, emitting
# the SCALED per-input cotangents plus the (1, CC) affine-cotangent
# accumulators in one invocation.

def _dx_kernel(*refs, n_in: int, kY: int, kX: int, kz: int,
               X: int, nb: int, bs: int, relu: bool, Y: int, out_dtype,
               head_block: int, tail_block: int,
               with_gstats: bool = False, want_band: bool = False,
               want_wrap: bool = False, G: int = 1):
    # operands: per fwd-input i: 1 center slab; then per i: scale, bias;
    # g: kY slabs; [y_out slab, gs1, gs2 when with_gstats];
    # bandT [, wrapT]; outputs: n_in dx slabs, n_in ds accumulators,
    # 1 db accumulator [, band cotangent acc [, wp acc, wm acc] when
    # want_band — the merged dx+dband backward (kY==1 only): both
    # kernels read the same x and g slabs, so fusing them deletes a
    # full (x + g [+ y]) read per conv].
    idx = 0
    x_refs = [refs[idx + i] for i in range(n_in)]
    idx += n_in
    sb_refs = []
    for _ in range(n_in):
        sb_refs.append((refs[idx], refs[idx + 1]))
        idx += 2
    g_refs = [refs[idx + d] for d in range(kY)]
    idx += kY
    if with_gstats:
        yst_ref = refs[idx]; idx += 1
        gs1_ref = refs[idx]; idx += 1
        gs2_ref = refs[idx]; idx += 1
    band_ref = refs[idx]; idx += 1
    if kz == 3:
        wrap_ref = refs[idx]; idx += 1
    dx_refs = [refs[idx + i] for i in range(n_in)]
    idx += n_in
    ds_refs = [refs[idx + i] for i in range(n_in)]
    idx += n_in
    db_ref = refs[idx]; idx += 1
    if want_band:
        bandc_ref = refs[idx]; idx += 1
        if want_wrap:
            wpc_ref = refs[idx]; idx += 1
            wmc_ref = refs[idx]

    y = pl.program_id(1)
    step = pl.program_id(0) * pl.num_programs(1) + y
    RX = X * nb
    R = G * RX
    assert G == 1 or kY == 1, (G, kY)

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    rloc = jax.lax.rem(rows_i, RX) if G > 1 else rows_i
    mrow = jax.lax.rem(rows_i, nb)
    head_m = mrow != 0
    tail_m = mrow != nb - 1
    # per-tap X-boundary masks (padless layout)
    tap_row_m = {0: rloc >= nb, 1: None, 2: rloc < RX - nb}
    if kz == 3:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (R, band_ref.shape[-1]), 1)
        co_out = band_ref.shape[-1] // bs
        # The transposed wrap matrices write ONE column block each —
        # block head_block for wplusT, tail_block for wminusT.  For the
        # stride-1 matrices these are (0, bs-1); the STRIDED cascade's
        # wminusT writes block valid_in-1 instead (the hardcoded bs-1
        # silently dropped that cotangent — caught by the interpret-mode
        # CI parity tests, round 3).
        head_cols = jnp.logical_and(
            head_m, jnp.logical_and(col >= head_block * co_out,
                                    col < (head_block + 1) * co_out))
        tail_cols = jnp.logical_and(
            tail_m, jnp.logical_and(col >= tail_block * co_out,
                                    col < (tail_block + 1) * co_out))

    @pl.when(step == 0)
    def _():
        for i in range(n_in):
            ds_refs[i][...] = jnp.zeros_like(ds_refs[i])
        db_ref[...] = jnp.zeros_like(db_ref)
        if want_band:
            bandc_ref[...] = jnp.zeros_like(bandc_ref)
            if want_wrap:
                wpc_ref[...] = jnp.zeros_like(wpc_ref)
                wmc_ref[...] = jnp.zeros_like(wmc_ref)

    def slab(ref):
        return ref[0].reshape(R, -1) if G > 1 else ref[0, 0]

    dt = None
    gm0 = None
    for dy in range(kY):
        gv = slab(g_refs[dy])
        if with_gstats:
            # output-stats cotangent folded in VMEM:
            # g_total = g + gs1 + 2*y*gs2  (kY==1 only — asserted by
            # the caller; a kY>1 fold would read kY y-slabs).
            yf = slab(yst_ref).astype(jnp.float32)
            gv = (gv.astype(jnp.float32) + gs1_ref[:]
                  + 2.0 * yf * gs2_ref[:]).astype(gv.dtype)
        if dy == kY // 2:
            gm0 = gv  # the (folded) center g slab, for the band cots
        if kY > 1:
            yy = y + dy - kY // 2
            vmask = jnp.logical_and(yy >= 0, yy < Y).astype(jnp.float32)
            gv = gv * vmask.astype(gv.dtype)
        part = None
        for dx in range(kX):
            tap = dy * kX + dx
            rows = _roll_rows(gv, ((1 - dx) * nb) % R) \
                if kX == 3 else gv
            a = jax.lax.dot_general(
                rows, band_ref[tap],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if kz == 3:
                p = jax.lax.dot_general(
                    rows, wrap_ref[tap],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                a = a + jnp.where(head_cols, _roll_rows(p, 1), 0.0)
                a = a + jnp.where(tail_cols, _roll_rows(p, R - 1), 0.0)
            if kX == 3 and tap_row_m[dx] is not None:
                a = jnp.where(tap_row_m[dx], a, 0.0)
            part = a if part is None else part + a
        dt = part if dt is None else dt + part

    # epilogue: relu mask from the recomputed pre-activation
    pre = None
    if relu or want_band:
        for i in range(n_in):
            s_ref, b_ref = sb_refs[i]
            term = slab(x_refs[i]) * s_ref[:] + b_ref[:]
            pre = term if pre is None else pre + term
    if relu:
        dtm = relu_grad_mask(pre, dt)
    else:
        dtm = dt

    db_ref[...] += jnp.sum(dtm, axis=0, keepdims=True)
    for i in range(n_in):
        s_ref, _ = sb_refs[i]
        dxv = (dtm * s_ref[:].astype(jnp.float32)).astype(out_dtype)
        if G > 1:
            dx_refs[i][0] = dxv.reshape(G, RX, -1)
        else:
            dx_refs[i][0, 0] = dxv
        ds_refs[i][...] += jnp.sum(
            dtm * slab(x_refs[i]).astype(jnp.float32), axis=0,
            keepdims=True)

    if want_band:
        # dband part (the former _dband_kernel, on the already-resident
        # slabs): dband[tap] = sum_r t[r + shift]^T gm0[r]
        t = jnp.maximum(pre, 0.0) if relu else pre
        if want_wrap:
            hgr = _roll_rows(jnp.where(head_m, gm0, 0.0), R - 1)
            tgr = _roll_rows(jnp.where(tail_m, gm0, 0.0), 1)
        dn = (((0,), (0,)), ((), ()))
        for dx_ in range(kX):
            rows = _roll_rows(t, (-(dx_ - kX // 2) * nb) % R) \
                if kX == 3 else t
            if kX == 3 and tap_row_m[dx_] is not None:
                rows = jnp.where(tap_row_m[dx_], rows, 0.0)
            bandc_ref[dx_] += jax.lax.dot_general(
                rows, gm0, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            if want_wrap:
                wpc_ref[dx_] += jax.lax.dot_general(
                    rows, hgr, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                wmc_ref[dx_] += jax.lax.dot_general(
                    rows, tgr, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)


def _rf_dx_kernel(*refs, n_in: int, kz: int, X: int, nb: int, bs: int,
                  relu: bool, Y: int, out_dtype, head_block: int,
                  tail_block: int, with_gstats: bool = False,
                  want_band: bool = False, want_wrap: bool = False,
                  G: int = 1):
    """Roll-free backward (kY==1, kX==3): transposed conv + epilogue
    [+ merged dband] with every tap an offset-slice read of a haloed
    scratch, chunked per Y-subrow — see :func:`_rf_kernel` for why both
    properties are load-bearing on Mosaic.  Same operand order as
    :func:`_dx_kernel` plus trailing scratches: gs (the folded g slab)
    [, ts (recomputed activations) when want_band]."""
    idx = 0
    x_refs = [refs[idx + i] for i in range(n_in)]
    idx += n_in
    sb_refs = []
    for _ in range(n_in):
        sb_refs.append((refs[idx], refs[idx + 1]))
        idx += 2
    g_ref = refs[idx]; idx += 1
    if with_gstats:
        yst_ref = refs[idx]; idx += 1
        gs1_ref = refs[idx]; idx += 1
        gs2_ref = refs[idx]; idx += 1
    band_ref = refs[idx]; idx += 1
    if kz == 3:
        wrap_ref = refs[idx]; idx += 1
    dx_refs = [refs[idx + i] for i in range(n_in)]
    idx += n_in
    ds_refs = [refs[idx + i] for i in range(n_in)]
    idx += n_in
    db_ref = refs[idx]; idx += 1
    if want_band:
        bandc_ref = refs[idx]; idx += 1
        if want_wrap:
            wpc_ref = refs[idx]; idx += 1
            wmc_ref = refs[idx]; idx += 1
    gs_ref = refs[idx]; idx += 1
    ts_ref = refs[idx] if want_band else None

    y = pl.program_id(1)
    step = pl.program_id(0) * pl.num_programs(1) + y
    RX = X * nb
    PAD = _halo_pad(nb)

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (RX, 1), 0)
    mrow = jax.lax.rem(rows_i, nb)
    head_m = mrow != 0
    tail_m = mrow != nb - 1
    tap_row_m = {0: rows_i >= nb, 1: None, 2: rows_i < RX - nb}
    if kz == 3:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (RX, band_ref.shape[-1]), 1)
        co_out = band_ref.shape[-1] // bs
        head_cols = jnp.logical_and(
            head_m, jnp.logical_and(col >= head_block * co_out,
                                    col < (head_block + 1) * co_out))
        tail_cols = jnp.logical_and(
            tail_m, jnp.logical_and(col >= tail_block * co_out,
                                    col < (tail_block + 1) * co_out))

    @pl.when(step == 0)
    def _():
        for i in range(n_in):
            ds_refs[i][...] = jnp.zeros_like(ds_refs[i])
        db_ref[...] = jnp.zeros_like(db_ref)
        if want_band:
            bandc_ref[...] = jnp.zeros_like(bandc_ref)
            if want_wrap:
                wpc_ref[...] = jnp.zeros_like(wpc_ref)
                wmc_ref[...] = jnp.zeros_like(wmc_ref)
        zg = jnp.zeros((PAD, gs_ref.shape[1]), gs_ref.dtype)
        gs_ref[pl.ds(0, PAD)] = zg
        gs_ref[pl.ds(PAD + G * RX, PAD)] = zg
        if ts_ref is not None:
            zt = jnp.zeros((PAD, ts_ref.shape[1]), ts_ref.dtype)
            ts_ref[pl.ds(0, PAD)] = zt
            ts_ref[pl.ds(PAD + G * RX, PAD)] = zt

    # phase 1: the (stats-folded) g slab per subrow into the scratch.
    for k in range(G):
        gv = g_ref[0, k]
        if with_gstats:
            yf = yst_ref[0, k].astype(jnp.float32)
            gv = (gv.astype(jnp.float32) + gs1_ref[:]
                  + 2.0 * yf * gs2_ref[:]).astype(gv.dtype)
        gs_ref[pl.ds(PAD + k * RX, RX)] = gv

    # phase 2: per subrow, transposed-conv taps + input-side epilogue.
    dn = (((1,), (0,)), ((), ()))
    for k in range(G):
        base = PAD + k * RX
        dt = None
        for dx in range(3):
            off = (dx - 1) * nb
            a = jax.lax.dot_general(
                gs_ref[pl.ds(base + off, RX)], band_ref[dx],
                dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            if kz == 3:
                ph = jax.lax.dot_general(
                    gs_ref[pl.ds(base + off - 1, RX)], wrap_ref[dx],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                pt = jax.lax.dot_general(
                    gs_ref[pl.ds(base + off + 1, RX)], wrap_ref[dx],
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                a = a + jnp.where(head_cols, ph, 0.0)
                a = a + jnp.where(tail_cols, pt, 0.0)
            if tap_row_m[dx] is not None:
                a = jnp.where(tap_row_m[dx], a, 0.0)
            dt = a if dt is None else dt + a

        pre = None
        if relu or want_band:
            for i in range(n_in):
                s_ref, b_ref = sb_refs[i]
                pre_t = x_refs[i][0, k] * s_ref[:] + b_ref[:]
                pre = pre_t if pre is None else pre + pre_t
        dtm = relu_grad_mask(pre, dt) if relu else dt

        db_ref[...] += jnp.sum(dtm, axis=0, keepdims=True)
        for i in range(n_in):
            s_ref, _ = sb_refs[i]
            dx_refs[i][0, k] = (dtm * s_ref[:].astype(jnp.float32)
                                ).astype(out_dtype)
            ds_refs[i][...] += jnp.sum(
                dtm * x_refs[i][0, k].astype(jnp.float32), axis=0,
                keepdims=True)
        if want_band:
            ts_ref[pl.ds(PAD + k * RX, RX)] = (
                jnp.maximum(pre, 0.0) if relu else pre)

    # phase 3 (merged dband): per subrow, weight cotangents from the
    # two scratches.  Shifted-mask forms of the rolled hgr/tgr: hgr[r]
    # = head_m[r+1]*gm0[r+1], tgr[r] = tail_m[r-1]*gm0[r-1]; the tgr
    # mask uses rem(r+nb-1) to keep the r==0 boundary row masked (its
    # flat-form source, the previous subrow's last row, was zeroed by
    # tail_m there), and subrow-crossing reads are masked for the same
    # reason (RX % nb == 0).
    if want_band:
        hgr_m = jax.lax.rem(rows_i + 1, nb) != 0
        tgr_m = jax.lax.rem(rows_i + (nb - 1), nb) != nb - 1
        dn0 = (((0,), (0,)), ((), ()))
        for k in range(G):
            base = PAD + k * RX
            gm0 = gs_ref[pl.ds(base, RX)]
            if want_wrap:
                hgr = jnp.where(hgr_m, gs_ref[pl.ds(base + 1, RX)], 0.0)
                tgr = jnp.where(tgr_m, gs_ref[pl.ds(base - 1, RX)], 0.0)
            for dx_ in range(3):
                off_ = (dx_ - 1) * nb
                rows = ts_ref[pl.ds(base + off_, RX)]
                if tap_row_m[dx_] is not None:
                    rows = jnp.where(tap_row_m[dx_], rows, 0.0)
                bandc_ref[dx_] += jax.lax.dot_general(
                    rows, gm0, dimension_numbers=dn0,
                    preferred_element_type=jnp.float32)
                if want_wrap:
                    wpc_ref[dx_] += jax.lax.dot_general(
                        rows, hgr, dimension_numbers=dn0,
                        preferred_element_type=jnp.float32)
                    wmc_ref[dx_] += jax.lax.dot_general(
                        rows, tgr, dimension_numbers=dn0,
                        preferred_element_type=jnp.float32)


def _dx_pallas(xs, scales, biases, g, bandT, wplusT, wminusT,
               kY: int, kX: int, X: int, nb: int, bs: int, relu: bool,
               head_block: int = 0, tail_block: int = None,
               interpret: bool = False, stats_cot=None,
               want_band: bool = False):
    """Transposed conv + epilogue: returns ([dx_i...], [ds_i...], db)
    with dx_i ALREADY scaled by s_i, ds/db as (CC,) fp32 sums; with
    ``want_band`` (kY==1, or kY==3 via the chunked variant) also the
    band [+ wplus/wminus] cotangents — the merged dx+dband backward.

    ``head_block``/``tail_block``: the single column block written by
    wplusT / wminusT (0 and bs-1 for stride-1; the strided cascade's
    wminusT writes block valid_in-1)."""
    if tail_block is None:
        tail_block = bs - 1
    n_in = len(xs)
    B, Y, RX, CC = xs[0].shape
    CCg = g.shape[-1]
    dt = xs[0].dtype
    kz = 3 if wplusT is not None else 1
    want_wrap = want_band and kz == 3

    if (kY == 3 and kX == 1 and wplusT is None
            and stats_cot is None):
        # (3,1,1) backward: chunk the kY g-slab reads (3x -> 1+2/G).
        G = _ychunk_G(Y, RX, max(CC, CCg), dt.itemsize)
        if G:
            return _dx_pallas_yck(xs, scales, biases, g, bandT, G,
                                  relu, interpret, want_band=want_band)
    assert not want_band or kY == 1, (kY, "merged dx+dband needs the "
                                      "single-g-slab form")
    rf = kY == 1 and kX == 3 and _use_rollfree()
    G1 = _g1_G(Y, RX, max(CC, CCg), dt.itemsize,
               rf=rf) if kY == 1 else 1

    ops = []
    in_specs = []
    for i in range(n_in):
        ops.append(xs[i])
        in_specs.append(pl.BlockSpec((1, G1, RX, CC),
                                     lambda b, y: (b, y, 0, 0),
                                     memory_space=pltpu.VMEM))
    for i in range(n_in):
        s = scales[i]
        b = biases[i]
        ops.append(jnp.ones((1, CC), dt) if s is None
                   else s.astype(dt).reshape(1, CC))
        ops.append(jnp.zeros((1, CC), dt) if b is None
                   else b.astype(dt).reshape(1, CC))
        in_specs += [pl.BlockSpec((1, CC), lambda b, y: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    for dy in range(kY):
        off = dy - kY // 2
        ops.append(g.astype(dt))
        if G1 > 1:  # kY == 1: the only slab is the center one
            in_specs.append(pl.BlockSpec(
                (1, G1, RX, CCg), lambda b, y: (b, y, 0, 0),
                memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(
                (1, 1, RX, CCg),
                lambda b, y, off=off: (b, jnp.clip(y + off, 0, Y - 1),
                                       0, 0),
                memory_space=pltpu.VMEM))
    if stats_cot is not None:
        assert kY == 1, "stats-cot fold needs the single-g-slab form"
        y_out, gs1, gs2 = stats_cot
        ops.append(y_out)
        in_specs.append(pl.BlockSpec((1, G1, RX, CCg),
                                     lambda b, y: (b, y, 0, 0),
                                     memory_space=pltpu.VMEM))
        for v in (gs1, gs2):
            ops.append(v.astype(jnp.float32).reshape(1, CCg))
            in_specs.append(pl.BlockSpec((1, CCg), lambda b, y: (0, 0),
                                         memory_space=pltpu.VMEM))

    nt = bandT.shape[0]
    w_spec = pl.BlockSpec((nt, CCg, CC), lambda b, y: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    ops.append(bandT.astype(dt))
    in_specs.append(w_spec)
    if kz == 3:
        ops.append((wplusT + wminusT).astype(dt))
        in_specs.append(w_spec)

    if rf:
        kern = functools.partial(
            _rf_dx_kernel, n_in=n_in, kz=kz, X=X, nb=nb, bs=bs,
            relu=relu, Y=Y, out_dtype=dt, head_block=head_block,
            tail_block=tail_block, with_gstats=stats_cot is not None,
            want_band=want_band, want_wrap=want_wrap, G=G1)
    else:
        kern = functools.partial(
            _dx_kernel, n_in=n_in, kY=kY, kX=kX, kz=kz, X=X, nb=nb,
            bs=bs, relu=relu, Y=Y, out_dtype=dt, head_block=head_block,
            tail_block=tail_block, with_gstats=stats_cot is not None,
            want_band=want_band, want_wrap=want_wrap, G=G1)
    scratch_shapes = []
    if rf:
        PAD = _halo_pad(nb)
        R = G1 * RX
        scratch_shapes.append(pltpu.VMEM((R + 2 * PAD, CCg), dt))
        if want_band:
            scratch_shapes.append(pltpu.VMEM((R + 2 * PAD, CC), dt))

    slab_spec = pl.BlockSpec((1, G1, RX, CC), lambda b, y: (b, y, 0, 0),
                             memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, CC), lambda b, y: (0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = ([slab_spec] * n_in + [acc_spec] * n_in + [acc_spec])
    out_shapes = ([jax.ShapeDtypeStruct((B, Y, RX, CC), dt)] * n_in
                  + [jax.ShapeDtypeStruct((1, CC), jnp.float32)]
                  * (n_in + 1))
    if want_band:
        nt = kY * kX
        bc_spec = pl.BlockSpec((nt, CC, CCg), lambda b, y: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        bc_shape = jax.ShapeDtypeStruct((nt, CC, CCg), jnp.float32)
        n_bc = 3 if want_wrap else 1
        out_specs += [bc_spec] * n_bc
        out_shapes += [bc_shape] * n_bc
    out = pl.pallas_call(
        kern,
        grid=(B, Y // G1),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=tuple(scratch_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(*ops)
    dxs = list(out[:n_in])
    dss = [o.reshape(-1) for o in out[n_in:2 * n_in]]
    db = out[2 * n_in].reshape(-1)
    if not want_band:
        return dxs, dss, db
    bc = out[2 * n_in + 1]
    if want_wrap:
        return dxs, dss, db, bc, out[2 * n_in + 2], out[2 * n_in + 3]
    return dxs, dss, db, bc, None, None


# --------------------------------------------------------------------------
# Y-chunked kernels for the kY==3 (3,1,1) convs (round 4, PERF roadmap 2)
# --------------------------------------------------------------------------
#
# The per-row grid reads each y slab kY times (the clamped neighbour
# index maps re-fetch it as dy=0/1/2 of three different steps); with G
# output rows per grid step the kernel reads a (1, G, RX, CC) main
# block plus two single-row halo refs — G+2 row reads for G outputs, so
# input traffic drops from 3x to (1+2/G)x (G=8: 1.25x).  Restricted to
# kY==3, kX==1, kz==1 (the encoder (3,1,1) convs, reference
# ``models/fpn/unets3D.py:187-219``): no x-rolls or z-wraps, each row's
# taps are three plain (RX, CC) @ (CC, CCo) dots — identical in form to
# the per-row kernel's, only the read pattern changes.  MMF_YCHUNK=0
# reverts to the per-row kernels (on-chip A/B in tools/onchip_r4.py).

def _ychunk_G(Y: int, RX: int = 0, CC: int = 0,
              itemsize: int = 2) -> int:
    """Largest G in {8, 4, 2} dividing Y, capped by MMF_YCHUNK
    (unset = 8; "0"/"1" disables) and — when the slab shape is given —
    by the MMF_SLAB_MB VMEM budget (see _slab_cap)."""
    try:
        cap = int(os.environ.get("MMF_YCHUNK", "8"))
    except ValueError:
        cap = 8
    if RX and CC:
        cap = _slab_cap(cap, RX, CC, itemsize)
    for g in (8, 4, 2):
        if g <= cap and Y % g == 0:
            return g
    return 0


def _yck_rows(x_triplets, sb_refs, n_in, G, c, nch, relu,
              dyn=None):
    """The activated rows t[-1..G] of a chunk: per-row affine(+ReLU)
    over main/halo refs, true-edge halos zeroed (their index maps
    clamp).  ``dyn`` = (ext_ref, dyn_valid) masks beyond the true
    extents (bucketed eval)."""
    ts = []
    for g in range(-1, G + 1):
        t = None
        for i in range(n_in):
            main, top, bot = x_triplets[i]
            xv = top[0, 0] if g < 0 else (bot[0, 0] if g == G
                                          else main[0, g])
            s_ref, b_ref = sb_refs[i]
            term = xv * s_ref[:] + b_ref[:]
            t = term if t is None else t + term
        if relu:
            t = jnp.maximum(t, 0.0)
        if dyn is not None:
            ext_ref, dyn_valid = dyn
            t = jnp.where(dyn_valid, t, jnp.zeros((), t.dtype))
            yg = c * G + g
            yv = jnp.logical_and(
                yg >= 0,            # top halo of chunk 0
                yg < ext_ref[0])    # mosaic-f32-ok: int32 scalar
            t = t * yv.astype(t.dtype)
        elif g < 0:
            t = t * (c > 0).astype(t.dtype)
        elif g == G:
            t = t * (c < nch - 1).astype(t.dtype)
        ts.append(t)
    return ts


def _yck_kernel(*refs, n_in: int, G: int, nb: int, bs: int, relu: bool,
                out_dtype, with_stats: bool, with_dyn: bool):
    # operands: per input i: main (1,G,RX,CC), top (1,1,RX,CC),
    # bot (1,1,RX,CC); per input: scale, bias; [ext (SMEM) if with_dyn;]
    # band (3, CC, CCo); outputs: y (1,G,RX,CCo) [, s1, s2].
    idx = 0
    x_triplets = []
    for _ in range(n_in):
        x_triplets.append((refs[idx], refs[idx + 1], refs[idx + 2]))
        idx += 3
    sb_refs = []
    for _ in range(n_in):
        sb_refs.append((refs[idx], refs[idx + 1]))
        idx += 2
    if with_dyn:
        ext_ref = refs[idx]; idx += 1
    band_ref = refs[idx]; idx += 1
    out_ref = refs[idx]; idx += 1
    if with_stats:
        s1_ref = refs[idx]; idx += 1
        s2_ref = refs[idx]

    c = pl.program_id(1)
    nch = pl.num_programs(1)
    if with_stats:
        step = pl.program_id(0) * nch + c

        @pl.when(step == 0)
        def _():
            s1_ref[...] = jnp.zeros_like(s1_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)

    dyn = None
    if with_dyn:
        RX = x_triplets[0][0].shape[-2]
        CC_in = x_triplets[0][0].shape[-1]
        ci_in = CC_in // bs
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (RX, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CC_in), 1)
        zlog = jax.lax.rem(rows_i, nb) * bs + lane // ci_in
        dyn_valid = jnp.logical_and(
            rows_i // nb < ext_ref[1],  # mosaic-f32-ok: int32 compare
            zlog < ext_ref[2])          # mosaic-f32-ok: int32 compare
        dyn = (ext_ref, dyn_valid)

    ts = _yck_rows(x_triplets, sb_refs, n_in, G, c, nch, relu, dyn)
    for g in range(G):
        acc = None
        for dy in range(3):
            a = jax.lax.dot_general(
                ts[g + dy], band_ref[dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = a if acc is None else acc + a
        yv = acc.astype(out_dtype)
        out_ref[0, g] = yv
        if with_stats:
            yf = yv.astype(jnp.float32)
            s1_ref[...] += jnp.sum(yf, axis=0, keepdims=True)
            s2_ref[...] += jnp.sum(yf * yf, axis=0, keepdims=True)


def _yck_x_specs(x, G, Y, RX, CC):
    """(main, top-halo, bottom-halo) operand/spec pairs for one input."""
    specs = [
        pl.BlockSpec((1, G, RX, CC), lambda b, c: (b, c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, RX, CC),
                     lambda b, c: (b, jnp.maximum(c * G - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, RX, CC),
                     lambda b, c: (b, jnp.minimum(c * G + G, Y - 1),
                                   0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return [x, x, x], specs


def _fused_conv_pallas_yck(xs, scales, biases, band, G: int, X: int,
                           nb: int, bs: int, relu: bool,
                           preferred_element_type, interpret: bool,
                           with_stats: bool, dyn_extents):
    n_in = len(xs)
    B, Y, RX, CC = xs[0].shape
    co = band.shape[-1] // bs
    dt = xs[0].dtype

    ops = []
    in_specs = []
    for i in range(n_in):
        o, s = _yck_x_specs(xs[i], G, Y, RX, CC)
        ops += o
        in_specs += s
    for i in range(n_in):
        s = scales[i]
        b = biases[i]
        ops.append(jnp.ones((1, CC), dt) if s is None
                   else s.astype(dt).reshape(1, CC))
        ops.append(jnp.zeros((1, CC), dt) if b is None
                   else b.astype(dt).reshape(1, CC))
        in_specs += [pl.BlockSpec((1, CC), lambda b, c: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    if dyn_extents is not None:
        yt, xt, zt = dyn_extents
        ops.append(jnp.stack([jnp.asarray(yt, jnp.int32),
                              jnp.asarray(xt, jnp.int32),
                              jnp.asarray(zt, jnp.int32)]))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    ops.append(band.astype(dt))
    in_specs.append(pl.BlockSpec(band.shape, lambda b, c: (0, 0, 0),
                                 memory_space=pltpu.VMEM))

    kern = functools.partial(
        _yck_kernel, n_in=n_in, G=G, nb=nb, bs=bs, relu=relu,
        out_dtype=preferred_element_type, with_stats=with_stats,
        with_dyn=dyn_extents is not None)

    y_spec = pl.BlockSpec((1, G, RX, bs * co), lambda b, c: (b, c, 0, 0),
                          memory_space=pltpu.VMEM)
    y_shape = jax.ShapeDtypeStruct((B, Y, RX, bs * co),
                                   preferred_element_type)
    if with_stats:
        acc_spec = pl.BlockSpec((1, bs * co), lambda b, c: (0, 0),
                                memory_space=pltpu.VMEM)
        acc_shape = jax.ShapeDtypeStruct((1, bs * co), jnp.float32)
        out_specs = (y_spec, acc_spec, acc_spec)
        out_shape = (y_shape, acc_shape, acc_shape)
    else:
        out_specs, out_shape = y_spec, y_shape
    return pl.pallas_call(
        kern,
        grid=(B, Y // G),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(*ops)


def _yck_dx_kernel(*refs, n_in: int, G: int, relu: bool, out_dtype,
                   want_band: bool = False):
    # operands: per fwd-input i: center x (1,G,RX,CC) [+ x top, x bot
    # when want_band]; per i: scale, bias; g main (1,G,RX,CCg), g top,
    # g bot; bandT (3, CCg, CC); outputs: n_in dx (1,G,RX,CC), n_in ds
    # (1,CC), db (1,CC) [, (3, CC, CCg) band cotangent acc].
    idx = 0
    x_refs = []
    for _ in range(n_in):
        if want_band:
            x_refs.append((refs[idx], refs[idx + 1], refs[idx + 2]))
            idx += 3
        else:
            x_refs.append((refs[idx], None, None))
            idx += 1
    sb_refs = []
    for _ in range(n_in):
        sb_refs.append((refs[idx], refs[idx + 1]))
        idx += 2
    g_main, g_top, g_bot = refs[idx], refs[idx + 1], refs[idx + 2]
    idx += 3
    band_ref = refs[idx]; idx += 1
    dx_refs = [refs[idx + i] for i in range(n_in)]
    idx += n_in
    ds_refs = [refs[idx + i] for i in range(n_in)]
    idx += n_in
    db_ref = refs[idx]; idx += 1
    if want_band:
        bandc_ref = refs[idx]

    c = pl.program_id(1)
    nch = pl.num_programs(1)
    step = pl.program_id(0) * nch + c

    @pl.when(step == 0)
    def _():
        for i in range(n_in):
            ds_refs[i][...] = jnp.zeros_like(ds_refs[i])
        db_ref[...] = jnp.zeros_like(db_ref)
        if want_band:
            bandc_ref[...] = jnp.zeros_like(bandc_ref)

    gs = []
    for g in range(-1, G + 1):
        gv = g_top[0, 0] if g < 0 else (g_bot[0, 0] if g == G
                                        else g_main[0, g])
        if g < 0:
            gv = gv * (c > 0).astype(gv.dtype)
        elif g == G:
            gv = gv * (c < nch - 1).astype(gv.dtype)
        gs.append(gv)

    if want_band:
        # activated rows t[-1..G] for the band cotangent:
        # dband[dy] = sum_y t[y + dy - 1]^T g[y]
        ts = _yck_rows(x_refs, sb_refs, n_in, G, c, nch, relu)

    for g in range(G):
        dt_l = None
        for dy in range(3):
            a = jax.lax.dot_general(
                gs[g + dy], band_ref[dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dt_l = a if dt_l is None else dt_l + a
        if relu:
            pre = None
            for i in range(n_in):
                s_ref, b_ref = sb_refs[i]
                term = x_refs[i][0][0, g] * s_ref[:] + b_ref[:]
                pre = term if pre is None else pre + term
            dtm = relu_grad_mask(pre, dt_l)
        else:
            dtm = dt_l
        db_ref[...] += jnp.sum(dtm, axis=0, keepdims=True)
        for i in range(n_in):
            s_ref, _ = sb_refs[i]
            dx_refs[i][0, g] = (
                dtm * s_ref[:].astype(jnp.float32)).astype(out_dtype)
            ds_refs[i][...] += jnp.sum(
                dtm * x_refs[i][0][0, g].astype(jnp.float32), axis=0,
                keepdims=True)
        if want_band:
            dn = (((0,), (0,)), ((), ()))
            for dy in range(3):
                bandc_ref[dy] += jax.lax.dot_general(
                    ts[g + dy], gs[g + 1], dimension_numbers=dn,
                    preferred_element_type=jnp.float32)


def _dx_pallas_yck(xs, scales, biases, g, bandT, G: int, relu: bool,
                   interpret: bool, want_band: bool = False):
    n_in = len(xs)
    B, Y, RX, CC = xs[0].shape
    CCg = g.shape[-1]
    dt = xs[0].dtype

    ops = []
    in_specs = []
    for i in range(n_in):
        if want_band:
            o, s = _yck_x_specs(xs[i], G, Y, RX, CC)
            ops += o
            in_specs += s
        else:
            ops.append(xs[i])
            in_specs.append(pl.BlockSpec((1, G, RX, CC),
                                         lambda b, c: (b, c, 0, 0),
                                         memory_space=pltpu.VMEM))
    for i in range(n_in):
        s = scales[i]
        b = biases[i]
        ops.append(jnp.ones((1, CC), dt) if s is None
                   else s.astype(dt).reshape(1, CC))
        ops.append(jnp.zeros((1, CC), dt) if b is None
                   else b.astype(dt).reshape(1, CC))
        in_specs += [pl.BlockSpec((1, CC), lambda b, c: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    go, gspecs = _yck_x_specs(g.astype(dt), G, Y, RX, CCg)
    ops += go
    in_specs += gspecs
    ops.append(bandT.astype(dt))
    in_specs.append(pl.BlockSpec((3, CCg, CC), lambda b, c: (0, 0, 0),
                                 memory_space=pltpu.VMEM))

    kern = functools.partial(_yck_dx_kernel, n_in=n_in, G=G, relu=relu,
                             out_dtype=dt, want_band=want_band)
    slab_spec = pl.BlockSpec((1, G, RX, CC), lambda b, c: (b, c, 0, 0),
                             memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, CC), lambda b, c: (0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = ([slab_spec] * n_in + [acc_spec] * (n_in + 1))
    out_shapes = ([jax.ShapeDtypeStruct((B, Y, RX, CC), dt)] * n_in
                  + [jax.ShapeDtypeStruct((1, CC), jnp.float32)]
                  * (n_in + 1))
    if want_band:
        out_specs.append(pl.BlockSpec((3, CC, CCg),
                                      lambda b, c: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((3, CC, CCg),
                                               jnp.float32))
    out = pl.pallas_call(
        kern,
        grid=(B, Y // G),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(*ops)
    dxs = list(out[:n_in])
    dss = [o.reshape(-1) for o in out[n_in:2 * n_in]]
    db = out[2 * n_in].reshape(-1)
    if not want_band:
        return dxs, dss, db
    return dxs, dss, db, out[2 * n_in + 1], None, None


def _yck_dband_kernel(*refs, n_in: int, G: int, relu: bool):
    # operands: per input i: main/top/bot x; per i: scale, bias;
    # g (1,G,RX,CCo); output: (3, CC, CCo) accumulator.
    idx = 0
    x_triplets = []
    for _ in range(n_in):
        x_triplets.append((refs[idx], refs[idx + 1], refs[idx + 2]))
        idx += 3
    sb_refs = []
    for _ in range(n_in):
        sb_refs.append((refs[idx], refs[idx + 1]))
        idx += 2
    g_ref = refs[idx]; idx += 1
    out_ref = refs[idx]

    c = pl.program_id(1)
    nch = pl.num_programs(1)
    step = pl.program_id(0) * nch + c

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    ts = _yck_rows(x_triplets, sb_refs, n_in, G, c, nch, relu)
    dn = (((0,), (0,)), ((), ()))
    for g in range(G):
        gm = g_ref[0, g]
        for dy in range(3):
            # dband[dy] = sum_y t[y + dy - 1]^T g[y]
            out_ref[dy] += jax.lax.dot_general(
                ts[g + dy], gm, dimension_numbers=dn,
                preferred_element_type=jnp.float32)


def _dband_pallas_yck(xs, scales, biases, g, G: int, relu: bool,
                      interpret: bool):
    n_in = len(xs)
    B, Y, RX, CC = xs[0].shape
    CCo = g.shape[-1]
    dt = xs[0].dtype

    ops = []
    in_specs = []
    for i in range(n_in):
        o, s = _yck_x_specs(xs[i], G, Y, RX, CC)
        ops += o
        in_specs += s
    for i in range(n_in):
        s = scales[i]
        b = biases[i]
        ops.append(jnp.ones((1, CC), dt) if s is None
                   else s.astype(dt).reshape(1, CC))
        ops.append(jnp.zeros((1, CC), dt) if b is None
                   else b.astype(dt).reshape(1, CC))
        in_specs += [pl.BlockSpec((1, CC), lambda b, c: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    ops.append(g.astype(dt))
    in_specs.append(pl.BlockSpec((1, G, RX, CCo),
                                 lambda b, c: (b, c, 0, 0),
                                 memory_space=pltpu.VMEM))

    kern = functools.partial(_yck_dband_kernel, n_in=n_in, G=G,
                             relu=relu)
    return pl.pallas_call(
        kern,
        grid=(B, Y // G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, CC, CCo), lambda b, c: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, CC, CCo), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(*ops)
