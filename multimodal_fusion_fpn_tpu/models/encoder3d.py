"""The 5-level 3D encoder loop with PACKED inter-stage plumbing.

When the fused Pallas stage lowering is active, every stage's output
stays in the padless thick layout and the inter-stage max pools run as
packed Pallas kernels (ops/pallas/pool.py) — the round-3 step-HLO audit
showed the compact-form pools (select-and-scatter on the 8x lane-padded
(…, Z, 16) layout) plus the layout copies at every packed/compact
boundary were among the largest single costs of the train step.
Projection heads consume the packed stage outputs directly.

Falls back per level to the compact path (classic stages, reduce_window
pools) whenever a stage or pool is ineligible — CPU runs, whole-volume
eval shapes, dropout-on configs.

Used by models/unet3d.py and models/fusion.py (reference call
structure: ``unets3D.py:8-485``, ``fusion3D2D.py:10-581``).
"""

from typing import Any, List, Optional, Tuple

from multimodal_fusion_fpn_tpu.models.blocks import (current_valid,
                                                     fused_stage_bs,
                                                     max_pool,
                                                     stage_dyn_extents,
                                                     valid_extents)

Meta = Optional[Tuple[int, int, int]]  # (X, nb, bs) when packed


def pooled_ext(ext, window, names=("y", "x", "z")):
    """Advance a true-extent dict through a stride==window max pool
    (torch floor semantics)."""
    if not ext:
        return ext
    new = dict(ext)
    for name, w in zip(names, window):
        if name in new and w > 1:
            new[name] = new[name] // w
    return new


def run_3d_encoder(Stage, channels, dropout, use_bn: bool, dtype,
                   x, train: bool, pools,
                   name_fmt: str = "conv{}"):
    """Run the 5 encoder stages + 4 inter-stage pools.

    Returns (convs, exts): per-level PRE-POOL outputs as (value, meta)
    pairs — meta is the (X, nb, bs) packed descriptor, or None when the
    value is a compact (B, Y, X, Z, C) array — and the per-level
    true-extent dicts (exact bucketing; all None outside it)."""
    from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import unpack
    from multimodal_fusion_fpn_tpu.ops.pallas.pool import pool_packed

    convs: List[Tuple[Any, Meta]] = []
    exts = []
    ext = current_valid()
    cur, meta = x, None
    in_ch = x.shape[-1]
    for lvl in range(5):
        exts.append(ext)
        if meta is not None:
            X, nb_in, bs_in = meta
            z = nb_in * bs_in
        else:
            X, z = cur.shape[2], cur.shape[3]
        # mirror EncoderStage._fused_eligible: under exact bucketing
        # the EVAL path keeps the fused (extent-masked) kernels
        with valid_extents(**(ext or {})):
            dyn_ok = stage_dyn_extents(train) is not None
        bs_lvl = fused_stage_bs(z, channels[lvl], use_bn, dropout[lvl],
                                ndim=3, dynamic_ok=dyn_ok)
        if bs_lvl is not None:
            # mirror EncoderStage's space gate exactly (the helper must
            # predict the stage's packed/compact decision)
            from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import (
                active_space_shards)
            if X % active_space_shards() != 0:
                bs_lvl = None
        stage = Stage(
            channels[lvl], dropout=dropout[lvl], use_bn=use_bn,
            downsample=(in_ch != channels[lvl]), ndim=3, dtype=dtype,
            packed_in=meta, keep_packed=bs_lvl is not None,
            name=name_fmt.format(lvl + 1))
        with valid_extents(**(ext or {})):
            out = stage(cur, train)
        out_meta: Meta = ((X, z // bs_lvl, bs_lvl)
                          if bs_lvl is not None else None)
        convs.append((out, out_meta))

        if lvl < 4:
            wY, wX, wZ = pools[lvl]
            Ycur = out.shape[1]
            from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import (
                active_space_shards)
            ns = active_space_shards()
            if (out_meta is not None and X % (wX * ns) == 0
                    and Ycur % wY == 0 and bs_lvl % wZ == 0):
                nbo = z // bs_lvl
                cur = pool_packed(out, X, nbo, bs_lvl, (wY, wX, wZ))
                meta = (X // wX, nbo, bs_lvl // wZ)
            else:
                compact = (unpack(out, *out_meta)
                           if out_meta is not None else out)
                cur = max_pool(compact, pools[lvl])
                meta = None
            ext = pooled_ext(ext, pools[lvl])
        in_ch = channels[lvl]
    return convs, exts


def as_compact(value, meta: Meta):
    """(value, meta) -> compact (B, Y, X, Z, C) array (free reshape)."""
    if meta is None:
        return value
    from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import unpack
    return unpack(value, *meta)


def as_compact_2d(value, meta: Meta):
    """(value, meta) -> compact (B, H, W, C) array (free reshapes —
    the 2D packed layout is the singleton-X 3D one with z = W)."""
    if meta is None:
        return value
    v = as_compact(value, meta)          # (B, H, 1, W, C)
    return v.reshape(v.shape[0], v.shape[1], v.shape[3], v.shape[4])


def run_2d_encoder(Stage, channels, dropout, use_bn: bool, dtype,
                   x, train: bool, pools, n_levels: int,
                   name_fmt: str = "conv{}_2d"):
    """2D twin of :func:`run_3d_encoder` on the singleton-X mapping
    (X = 1, z = W, see blocks.fused_stage_bs): stage outputs stay in
    the packed thick layout between stages and the inter-stage (2, 2)
    pools run packed as (wY=2, wX=1, wZ=2) — H pools on rows, W pools
    as z-slot pairs.  Exact bucketing and space meshes keep the proven
    per-op path (mirrors EncoderStage._fused_eligible).

    Returns (convs, exts): per-level PRE-POOL (value, meta) pairs —
    meta (1, nb, bs) when packed, None when compact (B, H, W, C) —
    plus per-level true-extent dicts.  Reference 2D encoder:
    ``fusion3D2D.py:261-293`` / ``unets2D.py:32-116``."""
    from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import (
        active_space_shards)
    from multimodal_fusion_fpn_tpu.ops.pallas.pool import pool_packed

    convs: List[Tuple[Any, Meta]] = []
    exts = []
    ext = current_valid()
    ext2d = ({k: v for k, v in ext.items() if k in ("h", "w")}
             if ext else None) or None
    cur, meta = x, None
    in_ch = x.shape[-1]
    for lvl in range(n_levels):
        exts.append(ext2d)
        if meta is not None:
            _, nb_in, bs_in = meta
            z = nb_in * bs_in
        else:
            z = cur.shape[2]
        # exact bucketing keeps the per-op path in 2D (EncoderStage's
        # own rule); a space mesh disables the fused 2D stages (X=1
        # cannot shard) — mirror both gates here so meta stays in sync
        # with the stage's packed/compact decision.
        bs_lvl = None
        if not ext2d and active_space_shards() == 1:
            bs_lvl = fused_stage_bs(z, channels[lvl], use_bn,
                                    dropout[lvl], ndim=2,
                                    dynamic_ok=False)
        stage = Stage(
            channels[lvl], dropout=dropout[lvl], use_bn=use_bn,
            downsample=(in_ch != channels[lvl]), ndim=2, dtype=dtype,
            packed_in=meta, keep_packed=bs_lvl is not None,
            name=name_fmt.format(lvl + 1))
        with valid_extents(**(ext2d or {})):
            out = stage(cur, train)
        out_meta: Meta = ((1, z // bs_lvl, bs_lvl)
                          if bs_lvl is not None else None)
        convs.append((out, out_meta))

        if lvl < n_levels - 1:
            wH, wW = pools[min(lvl, 3)]
            Ycur = out.shape[1]
            if (out_meta is not None and Ycur % wH == 0
                    and bs_lvl % wW == 0):
                nbo = z // bs_lvl
                cur = pool_packed(out, 1, nbo, bs_lvl, (wH, 1, wW))
                meta = (1, nbo, bs_lvl // wW)
            else:
                compact = as_compact_2d(out, out_meta)
                cur = max_pool(compact, pools[min(lvl, 3)])
                meta = None
            ext2d = pooled_ext(ext2d, pools[min(lvl, 3)],
                               names=("h", "w"))
        in_ch = channels[lvl]
    return convs, exts


def proj_depth_ext(ext, num_reductions: int, final_kernel: int):
    """The TRUE depth extent of a projection head's output (the
    stride-2 cascade then the VALID final conv) — the divisor for the
    exact masked mean.  None outside exact bucketing."""
    if not ext or "z" not in ext:
        return None
    z = ext["z"]
    for _ in range(num_reductions):
        z = (z + 1) // 2
    return z - final_kernel + 1
