"""Hybrid 3D+2D fusion U-Nets.

Behavioral parity with ``/root/reference/models/fpn/fusion3D2D.py``:

  * :class:`ModifiedUnet3D2D` (``:10-469``): 3D encoder + projection heads
    (as in ModifiedUnet3D), a parallel 4-level 2D encoder with pools
    (1,2),(1,2),(2,2),(2,2), per-level alignment of the 2D skips to the 3D
    en-face resolution (trilinear ``'2d'`` / adaptive max ``'2d_max'`` /
    none), and a shared decoder whose blocks fuse (3D-skip, 2D-skip,
    deeper) by concat or add.
  * :class:`ModifiedUnet3D2DLevel5` (``:473-581``): adds a 5th 2D encoder
    stage and fuses the two bottlenecks by channel concat, so the first
    decoder block sees ``channels[4]*2`` deep channels.

Layouts: 3D (B, Y, X, Z, C); 2D (B, H, W, C); 2D skips are lifted to
(B, H, W, 1, C) before alignment/fusion.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec
from multimodal_fusion_fpn_tpu.models.blocks import (
    EncoderStage, UpBlockFusion, ZDimReduction, conv_kernel_init, max_pool,
    maybe_remat)
from multimodal_fusion_fpn_tpu.models.unet3d import (
    NUM_REDUCTIONS, POOLS_3D, UPFACTORS)
from multimodal_fusion_fpn_tpu.ops.interpolate import linear_resize
from multimodal_fusion_fpn_tpu.ops.pooling import adaptive_max_pool

POOLS_2D = ((1, 2), (1, 2), (2, 2), (2, 2))


def align_2d_skip(skip2d, target_shape, interpolate: Optional[str],
                  true_2d=None, true_3d=None):
    """Lift a 2D skip to 5D and align it to the 3D skip's spatial shape.

    ``target_shape`` is the 3D skip's (Y, X, Z) shape.  Reference:
    ``fusion3D2D.py:420-453``.  Under exact bucketing ``true_2d``
    (h, w) and ``true_3d`` (y, x) carry the DYNAMIC extents and the
    alignment computes over them inside the padded buffers (the static
    path would use the padded — wrong — sizes)."""
    x = skip2d[:, :, :, None, :]  # (B, H, W, 1, C)
    if true_2d is not None and true_3d is not None:
        from multimodal_fusion_fpn_tpu.ops.dynamic_extent import (
            adaptive_max_pool_dynamic, linear_resize_dynamic)
        t_in = (true_2d.get("h"), true_2d.get("w"), None)
        t_out = (true_3d.get("y"), true_3d.get("x"), None)
        pads = (target_shape[0], target_shape[1], None)
        if interpolate == "2d":
            return linear_resize_dynamic(x, t_in, t_out, axes=(1, 2, 3),
                                         out_pads=pads)
        if interpolate == "2d_max":
            return adaptive_max_pool_dynamic(x, t_in, t_out,
                                             axes=(1, 2, 3),
                                             max_ratio=16, out_pads=pads)
        if interpolate is not None:
            raise ValueError(f"Unknown interpolate mode: {interpolate}")
        return x
    if interpolate == "2d":
        x = linear_resize(x, target_shape, axes=(1, 2, 3))
    elif interpolate == "2d_max":
        x = adaptive_max_pool(x, target_shape, axes=(1, 2, 3))
    elif interpolate is not None:
        raise ValueError(f"Unknown interpolate mode: {interpolate}")
    return x


class ModifiedUnet3D2D(nn.Module):
    spec: ArchSpec
    n_classes: int = 1
    interpolate: Optional[str] = None
    feature_fusion: str = "concat"
    levels: int = 4  # 4 (base) or 5 (Level5 bottleneck fusion)
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, volume, enface, train: bool = False):
        """volume: (B, Y, X, Z, C); enface: (B, H, W, C).
        Returns (B, Y, X, 1, n_classes)."""
        spec = self.spec
        ch, drop = spec.channels, spec.dropout
        bn = spec.is_batchnorm
        n2d = 5 if self.levels == 5 else 4
        Stage = maybe_remat(EncoderStage, self.remat)
        Proj = maybe_remat(ZDimReduction, self.remat)
        Up = maybe_remat(UpBlockFusion, self.remat, train_argnum=4)

        # --- 2D encoder ---------------------------------------------------
        from multimodal_fusion_fpn_tpu.models.blocks import (
            current_valid, valid_extents)
        from multimodal_fusion_fpn_tpu.models.encoder3d import (
            as_compact_2d, proj_depth_ext, run_2d_encoder,
            run_3d_encoder)
        root_ext = current_valid()
        # the root context carries BOTH modalities' extents: (y, x, z)
        # for the volume and (h, w) for the en-face map.
        convs2d, exts2d = run_2d_encoder(Stage, ch, drop, bn,
                                         self.dtype, enface, train,
                                         POOLS_2D, n2d)
        skips2d = [as_compact_2d(v, m) for v, m in convs2d]

        # --- 3D encoder (packed inter-stage plumbing) -----------------------
        ext3d_root = ({k: v for k, v in root_ext.items()
                       if k in ("y", "x", "z")}
                      if root_ext else None) or None
        with valid_extents(**(ext3d_root or {})):
            convs, exts = run_3d_encoder(Stage, ch, drop, bn, self.dtype,
                                         volume, train, POOLS_3D)

        # --- 3D skips: depth projection + mean -----------------------------
        projected = []
        for lvl in range(5):
            with valid_extents(**(exts[lvl] or {})):
                p = Proj(
                    ch[lvl], num_reductions=NUM_REDUCTIONS[lvl],
                    final_kernel=4, use_bn=bn, dropout=0.0,
                    dtype=self.dtype, packed_in=convs[lvl][1],
                    name=f"zdimRed{lvl + 1}")(convs[lvl][0], train)
            zf = proj_depth_ext(exts[lvl], NUM_REDUCTIONS[lvl], 4)
            if zf is not None:
                p = jnp.sum(p, axis=3, keepdims=True) / zf.astype(p.dtype)
            else:
                p = jnp.mean(p, axis=3, keepdims=True)
            projected.append(p)

        # --- 2D skips: lift + align ----------------------------------------
        aligned2d = [
            align_2d_skip(skips2d[lvl], projected[lvl].shape[1:4],
                          self.interpolate,
                          true_2d=exts2d[lvl], true_3d=exts[lvl])
            for lvl in range(min(n2d, 4))
        ]

        # --- decoder --------------------------------------------------------
        if self.levels == 5:
            bottom2d = align_2d_skip(skips2d[4], projected[4].shape[1:4],
                                     self.interpolate,
                                     true_2d=exts2d[4], true_3d=exts[4])
            deep = jnp.concatenate([projected[4], bottom2d], axis=-1)
        else:
            deep = projected[4]

        up = deep
        for i, lvl in enumerate((3, 2, 1, 0)):
            dec_ext = ({k: v for k, v in exts[lvl].items()
                        if k in ("y", "x")} if exts[lvl] else None)
            with valid_extents(**(dec_ext or {})):
                up = Up(
                    ch[lvl], upfactor=UPFACTORS[i],
                    mode=self.feature_fusion,
                    use_bn=bn, is_deconv=spec.is_deconv,
                    dropout=drop[5 + i],
                    dtype=self.dtype,
                    name=f"up_concat{lvl + 1}")(
                        projected[lvl], aligned2d[lvl], up, train)

        return nn.Conv(self.n_classes, kernel_size=(1, 1, 1),
                       kernel_init=conv_kernel_init,
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="final1")(up)


def ModifiedUnet3D2DLevel5(spec: ArchSpec, n_classes: int = 1,
                           interpolate: Optional[str] = None,
                           feature_fusion: str = "concat",
                           remat: bool = False,
                           dtype: Any = jnp.float32,
                           name: Optional[str] = None) -> ModifiedUnet3D2D:
    return ModifiedUnet3D2D(spec=spec, n_classes=n_classes,
                            interpolate=interpolate,
                            feature_fusion=feature_fusion, levels=5,
                            remat=remat, dtype=dtype, name=name)
