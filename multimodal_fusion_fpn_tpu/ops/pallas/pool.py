"""Max pooling ON the padless thick layout (Pallas).

The compact-form pool is the single most expensive "glue" op in the
flagship step: on (B, Y, X, Z, 16) the 16-channel lane dim is padded
8x in HBM, the reduce_window backward lowers to select-and-scatter
(measured 25 ms for the stage-1 pool alone, v5e bf16), and XLA inserts
260 MB layout copies between the pool and the Pallas stage kernels
(step-HLO audit, round 3).  Pooling directly on the packed
(B, Y, RX=X*nb, bs*C) buffers removes the padding, the scatter and the
boundary copies:

  * Y/X pooling = elementwise max of block pairs, wired through
    BlockSpec index maps (grid step (b, y', x') reads the wY*wX input
    blocks (y'*wY+dy, (x'*wX+dx)*nb rows) — no shuffles at all).
  * z pooling = max over adjacent z SLOTS (z = m*bs + j, so a (1,1,2)
    window pairs slots 2j/2j+1 inside each block — lane-group max +
    static-slice compaction, all in VMEM).

The backward routes the cotangent to every tied max location (ties are
measure-zero for continuous activations; exact-zero ReLU ties are
killed upstream by the ReLU mask either way).

Pool windows are the model family's (1,2,2)/(2,2,2) (reference
``unets3D.py``/``fusion3D2D.py`` MaxPool3d); any wY,wX,wZ in {1,2} with
even extents is supported.
"""

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tie_mask(x, o):
    """``x == o`` for the max-location routing, with the compare idiom
    selected by MMF_MASK_IDIOM (same knob and rationale as
    fused_conv.relu_grad_mask — round-5 on-chip finding: float vector
    compares on bf16-upcast operands silently mis-lower on current
    Mosaic).  Default: signed-int32 equality of the fp32 bit patterns,
    with +0/-0 normalized by adding 0.0 (no NaNs in activations)."""
    xf = x.astype(jnp.float32)
    of = o.astype(jnp.float32)
    if os.environ.get("MMF_MASK_IDIOM", "bitcast") == "f32":
        # legacy escape hatch, KNOWN-miscompiling on bf16-upcast data —
        # reachable only via explicit MMF_MASK_IDIOM=f32
        return xf == of  # mosaic-f32-ok: legacy
    bx = lax.bitcast_convert_type(xf + 0.0, jnp.int32)
    bo = lax.bitcast_convert_type(of + 0.0, jnp.int32)
    return bx == bo  # mosaic-f32-ok: int32 compare


def _zpair_max(v, bs: int, C: int):
    """(..., bs*C) -> (..., (bs//2)*C): max over z-slot pairs."""
    parts = [
        jnp.maximum(v[..., (2 * j) * C:(2 * j + 1) * C],
                    v[..., (2 * j + 1) * C:(2 * j + 2) * C])
        for j in range(bs // 2)
    ]
    if len(parts) == 1:  # mosaic-f32-ok: static python len
        return parts[0]
    return jnp.concatenate(parts, axis=-1)


def _zpair_expand(e, bs_out: int, C: int):
    """(..., bs_out*C) -> (..., 2*bs_out*C): duplicate each slot group
    (inverse indexing of :func:`_zpair_max`)."""
    parts = []
    for j in range(bs_out):
        g = e[..., j * C:(j + 1) * C]
        parts.extend((g, g))
    if len(parts) == 1:  # mosaic-f32-ok: static python len
        return parts[0]
    return jnp.concatenate(parts, axis=-1)


def _pool_row_mode() -> bool:
    """Whole-X-row pool blocks (MMF_POOL_ROW; default OFF since round
    5: the row kernels are the one remaining construct Mosaic REJECTS
    at full flagship shapes — the round-5 full-step bisect isolated
    them as the sole breaker once the multi-row conv slabs were capped
    (results/mosaic_bisect_r5.jsonl: only off:MMF_POOL_ROW compiles,
    26.1 img/s).  "1" opts back in for small-shape experiments.)

    The per-window grid runs (B, Y/wY, X/wX) steps on (nb, CC) blocks —
    ~1 KB of work per step at stage-1 sizes (63k steps for the s1
    pool).  Row mode runs (B, Y/wY) steps, each reading the full
    (wY, X, nb, CC) input row as ONE contiguous DMA and writing the
    whole pooled row."""
    return os.environ.get("MMF_POOL_ROW", "0") == "1"


def _pool_rowk(nXo: int) -> int:
    """K-window CHUNKED row mode (MMF_POOL_ROWK=K, default 8, "0"
    reverts to the per-window grid): the middle ground after round 5
    rejected the full-row kernels at flagship shapes (scoped-VMEM OOM)
    — grid (B, Y/wY, nXo/K) steps, each processing K pooled columns
    from one contiguous (wY, K*wX, nb, CC) block via the SAME
    row-kernel body at bounded extent.  On-chip A/B: default-on is the
    round-5 best config (148.1 ms vs 154.1 per-window,
    results/onchip_r5.jsonl train_b4_bf16_rowk8).  Returns the largest
    divisor of ``nXo`` in {16, 8, 4, 2} capped by the env value."""
    try:
        cap = int(os.environ.get("MMF_POOL_ROWK", "8") or 0)
    except ValueError:
        cap = 8
    for k in (16, 8, 4, 2):
        if k <= cap and nXo % k == 0:
            return k
    return 0


def _fwd_row_kernel(x_ref, out_ref, *, wY: int, wX: int, nXo: int,
                    bs: int, C: int, wZ: int):
    # x_ref: (1, wY, X, nb, CC); out_ref: (1, 1, nXo, nb, CCo)
    v = x_ref[0]
    v = v.reshape(wY, nXo, wX, v.shape[-2], v.shape[-1])
    m = None
    for dy in range(wY):
        for dx in range(wX):
            p = v[dy, :, dx]
            m = p if m is None else jnp.maximum(m, p)
    if wZ == 2:
        m = _zpair_max(m, bs, C)
    out_ref[0, 0] = m


def _bwd_row_kernel(x_ref, o_ref, g_ref, dx_ref, *, wY: int, wX: int,
                    nXo: int, bs: int, C: int, wZ: int):
    # x_ref/dx_ref: (1, wY, X, nb, CC); o_ref/g_ref: (1, 1, nXo, nb,
    # CCo).  Same tie-routing as _bwd_kernel, whole rows per step.
    o = o_ref[0, 0]
    g = g_ref[0, 0]
    if wZ == 2:
        o = _zpair_expand(o, bs // 2, C)
        g = _zpair_expand(g, bs // 2, C)
    of = o.astype(jnp.float32)
    for dy in range(wY):
        xw = x_ref[0, dy]
        xw = xw.reshape(nXo, wX, xw.shape[-2], xw.shape[-1])
        parts = []
        for dx in range(wX):
            x = xw[:, dx]
            tie = _tie_mask(x, of)
            parts.append(jnp.where(tie, g, 0.0).astype(x.dtype))
        row = jnp.stack(parts, axis=1)
        dx_ref[0, dy] = row.reshape(nXo * wX, *row.shape[2:])


def _fwd_kernel(*refs, n_in: int, bs: int, C: int, wZ: int):
    out_ref = refs[n_in]
    v = refs[0][0, 0, 0]
    for i in range(1, n_in):
        v = jnp.maximum(v, refs[i][0, 0, 0])
    if wZ == 2:
        v = _zpair_max(v, bs, C)
    out_ref[0, 0, 0] = v


def _bwd_kernel(x_ref, o_ref, g_ref, dx_ref, *, bs: int, C: int,
                wZ: int, wY: int, wX: int):
    # pooled-resolution grid (round 4): one step reads the (wY, wX)
    # window of x plus o/g ONCE and writes the whole dx window — the
    # full-resolution grid re-read o/g wY*wX times (4 -> 2.5 passes).
    o = o_ref[0, 0, 0]
    g = g_ref[0, 0, 0]
    if wZ == 2:
        o = _zpair_expand(o, bs // 2, C)
        g = _zpair_expand(g, bs // 2, C)
    for dy in range(wY):
        for dx in range(wX):
            x = x_ref[0, dy, dx]
            tie = _tie_mask(x, o)
            dx_ref[0, dy, dx] = jnp.where(tie, g, 0.0).astype(x.dtype)


def _specs(nb: int, CC: int, wY: int, wX: int):
    """The wY*wX paired input block specs on the 5D (B, Y, X, nb, CC)
    view — nb gets its own dim so the (nb, CC) block trailing dims
    EQUAL the array dims (Mosaic requires 8/128-divisible or full)."""
    specs = []
    for dy in range(wY):
        for dx in range(wX):
            specs.append(pl.BlockSpec(
                (1, 1, 1, nb, CC),
                lambda b, y, x, dy=dy, dx=dx: (b, y * wY + dy,
                                               x * wX + dx, 0, 0),
                memory_space=pltpu.VMEM))
    return specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _pool_packed_op(xp: jnp.ndarray, X: int, nb: int, bs: int,
                    window: Tuple[int, int, int],
                    interpret: bool = None) -> jnp.ndarray:
    return _pool_fwd_impl(xp, X, nb, bs, window, interpret)


def pool_packed(xp: jnp.ndarray, X: int, nb: int, bs: int,
                window: Tuple[int, int, int],
                interpret: bool = None) -> jnp.ndarray:
    """(B, Y, X*nb, bs*C) -> (B, Y//wY, (X//wX)*nb, (bs//wZ)*C).

    Under a declared space mesh (fused_conv.set_space_sharding) the
    pool runs inside shard_map — windows never straddle X shards
    (stride == window), so no halo is needed."""
    from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as _fc
    if _fc._SPACE is not None:
        from jax import shard_map
        mesh, da, sa = _fc._SPACE
        ns = mesh.shape[sa]
        assert X % (ns * window[1]) == 0, (X, ns, window)
        bspec, _ = _fc._row_specs()
        return shard_map(
            lambda xl: _pool_packed_op(xl, X // ns, nb, bs, window,
                                       interpret),
            mesh=mesh, in_specs=(bspec,), out_specs=bspec,
            check_vma=False)(xp)
    return _pool_packed_op(xp, X, nb, bs, window, interpret)


def _pool_fwd_impl(xp, X, nb, bs, window, interpret=None):
    if interpret is None:  # auto: interpret the kernel off-TPU (CI)
        from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as _fc
        interpret = _fc._INTERPRET or jax.default_backend() != "tpu"
    wY, wX, wZ = window
    B, Y, RX, CC = xp.shape
    C = CC // bs
    assert RX == X * nb, (xp.shape, X, nb)
    assert Y % wY == 0 and X % wX == 0 and bs % wZ == 0, (xp.shape,
                                                         window)
    n_in = wY * wX
    CCo = (bs // wZ) * C
    x5 = xp.reshape(B, Y, X, nb, CC)
    out_shape = jax.ShapeDtypeStruct(
        (B, Y // wY, X // wX, nb, CCo), xp.dtype)
    if _pool_row_mode():
        kern = functools.partial(_fwd_row_kernel, wY=wY, wX=wX,
                                 nXo=X // wX, bs=bs, C=C, wZ=wZ)
        out = pl.pallas_call(
            kern,
            grid=(B, Y // wY),
            in_specs=[pl.BlockSpec((1, wY, X, nb, CC),
                                   lambda b, y: (b, y, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, X // wX, nb, CCo),
                                   lambda b, y: (b, y, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
        )(x5)
        return out.reshape(B, Y // wY, (X // wX) * nb, CCo)
    K = _pool_rowk(X // wX)
    if K:
        kern = functools.partial(_fwd_row_kernel, wY=wY, wX=wX,
                                 nXo=K, bs=bs, C=C, wZ=wZ)
        out = pl.pallas_call(
            kern,
            grid=(B, Y // wY, (X // wX) // K),
            in_specs=[pl.BlockSpec((1, wY, K * wX, nb, CC),
                                   lambda b, y, x: (b, y, x, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, K, nb, CCo),
                                   lambda b, y, x: (b, y, x, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
        )(x5)
        return out.reshape(B, Y // wY, (X // wX) * nb, CCo)
    kern = functools.partial(_fwd_kernel, n_in=n_in, bs=bs, C=C, wZ=wZ)
    out = pl.pallas_call(
        kern,
        grid=(B, Y // wY, X // wX),
        in_specs=_specs(nb, CC, wY, wX),
        out_specs=pl.BlockSpec((1, 1, 1, nb, CCo),
                               lambda b, y, x: (b, y, x, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        interpret=interpret,
    )(*([x5] * n_in))
    return out.reshape(B, Y // wY, (X // wX) * nb, CCo)


def _pool_vjp_fwd(xp, X, nb, bs, window, interpret=None):
    out = _pool_fwd_impl(xp, X, nb, bs, window, interpret)
    return out, (xp, out)


def _pool_vjp_bwd(X, nb, bs, window, interpret, res, g):
    if interpret is None:
        from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as _fc
        interpret = _fc._INTERPRET or jax.default_backend() != "tpu"
    xp, out = res
    wY, wX, wZ = window
    B, Y, RX, CC = xp.shape
    C = CC // bs
    CCo = (bs // wZ) * C
    x5 = xp.reshape(B, Y, X, nb, CC)
    o5 = out.reshape(B, Y // wY, X // wX, nb, CCo)
    g5 = g.astype(xp.dtype).reshape(B, Y // wY, X // wX, nb, CCo)
    if _pool_row_mode():
        kern = functools.partial(_bwd_row_kernel, wY=wY, wX=wX,
                                 nXo=X // wX, bs=bs, C=C, wZ=wZ)
        x_spec = pl.BlockSpec((1, wY, X, nb, CC),
                              lambda b, y: (b, y, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((1, 1, X // wX, nb, CCo),
                              lambda b, y: (b, y, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        dx = pl.pallas_call(
            kern,
            grid=(B, Y // wY),
            in_specs=[x_spec, o_spec, o_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x5.shape, xp.dtype),
            interpret=interpret,
        )(x5, o5, g5)
        return (dx.reshape(xp.shape),)
    K = _pool_rowk(X // wX)
    if K:
        kern = functools.partial(_bwd_row_kernel, wY=wY, wX=wX,
                                 nXo=K, bs=bs, C=C, wZ=wZ)
        x_spec = pl.BlockSpec((1, wY, K * wX, nb, CC),
                              lambda b, y, x: (b, y, x, 0, 0),
                              memory_space=pltpu.VMEM)
        o_spec = pl.BlockSpec((1, 1, K, nb, CCo),
                              lambda b, y, x: (b, y, x, 0, 0),
                              memory_space=pltpu.VMEM)
        dx = pl.pallas_call(
            kern,
            grid=(B, Y // wY, (X // wX) // K),
            in_specs=[x_spec, o_spec, o_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x5.shape, xp.dtype),
            interpret=interpret,
        )(x5, o5, g5)
        return (dx.reshape(xp.shape),)
    kern = functools.partial(_bwd_kernel, bs=bs, C=C, wZ=wZ,
                             wY=wY, wX=wX)
    # pooled-resolution grid: each step reads the (wY, wX) x-window,
    # o and g once, and writes the whole dx window (trailing block
    # dims (nb, CC) equal the array dims — Mosaic's rule).
    x_spec = pl.BlockSpec((1, wY, wX, nb, CC),
                          lambda b, y, x: (b, y, x, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, 1, 1, nb, CCo),
                          lambda b, y, x: (b, y, x, 0, 0),
                          memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        kern,
        grid=(B, Y // wY, X // wX),
        in_specs=[x_spec, o_spec, o_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x5.shape, xp.dtype),
        interpret=interpret,
    )(x5, o5, g5)
    return (dx.reshape(xp.shape),)


_pool_packed_op.defvjp(_pool_vjp_fwd, _pool_vjp_bwd)


def retarget_bs(xp: jnp.ndarray, X: int, nb: int, bs: int,
                new_bs: int):
    """Re-view a dense packed buffer at a different block size (free
    reshape in the padless layout): (X*nb rows, bs*C) -> (X*nb2 rows,
    new_bs*C) with nb2 = nb*bs // new_bs.  Requires (nb*bs) % new_bs
    == 0."""
    B, Y, RX, CC = xp.shape
    C = CC // bs
    z = nb * bs
    assert z % new_bs == 0, (z, new_bs)
    nb2 = z // new_bs
    xt = xp.reshape(B, Y, X, z, C)
    return xt.reshape(B, Y, X * nb2, new_bs * C), nb2
