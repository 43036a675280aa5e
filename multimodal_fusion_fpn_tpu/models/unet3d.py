"""ModifiedUnet3D — the projective 3D→2D U-Net.

Behavioral parity with ``/root/reference/models/fpn/unets3D.py:8-485``:
a 5-level 3D encoder over (B, Y, X, Z, C) volumes with pools
(1,2,2),(1,2,2),(2,2,2),(2,2,2); per-level depth-projection heads
(``zdimRed1..5`` with 4,3,2,1,0 strided reductions + (1,1,4) VALID conv)
followed by a mean over the remaining depth; a 4-level 2D-within-3D
decoder with upfactors (2,2,1),(2,2,1),(1,2,1),(1,2,1); a final 1x1x1
conv.  ``classification=True`` returns the bottleneck features and skips
projection/decoder entirely (the reference keeps those parameters frozen;
here they are simply not instantiated).  ``original=True`` keeps the
reference's final-kernel-8, no-mean variant.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec
from multimodal_fusion_fpn_tpu.models.blocks import (
    EncoderStage, UpBlock2, ZDimReduction, conv_kernel_init, maybe_remat)

POOLS_3D = ((1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2))
UPFACTORS = ((2, 2, 1), (2, 2, 1), (1, 2, 1), (1, 2, 1))
NUM_REDUCTIONS = (4, 3, 2, 1, 0)


class ModifiedUnet3D(nn.Module):
    spec: ArchSpec
    n_classes: int = 1
    use_1x1: bool = True
    original: bool = False
    classification: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, Y, X, Z, C_in) volume; returns (B, Y, X, 1, n_classes)
        (or (B, Y', X', Z', C5) bottleneck when ``classification``)."""
        spec = self.spec
        ch, drop = spec.channels, spec.dropout
        bn = spec.is_batchnorm

        Stage = maybe_remat(EncoderStage, self.remat)
        Proj = maybe_remat(ZDimReduction, self.remat)
        Up = maybe_remat(UpBlock2, self.remat, train_argnum=3)
        from multimodal_fusion_fpn_tpu.models.blocks import valid_extents
        from multimodal_fusion_fpn_tpu.models.encoder3d import (
            as_compact, proj_depth_ext, run_3d_encoder)
        convs, exts = run_3d_encoder(Stage, ch, drop, bn, self.dtype, x,
                                     train, POOLS_3D)

        if self.classification:
            return as_compact(*convs[4])

        final_kernel = 8 if self.original else 4
        projected = []
        for lvl in range(5):
            with valid_extents(**(exts[lvl] or {})):
                p = Proj(
                    ch[lvl], num_reductions=NUM_REDUCTIONS[lvl],
                    final_kernel=final_kernel, use_bn=bn, dropout=0.0,
                    dtype=self.dtype, packed_in=convs[lvl][1],
                    name=f"zdimRed{lvl + 1}")(convs[lvl][0], train)
            if not self.original:
                zf = proj_depth_ext(exts[lvl], NUM_REDUCTIONS[lvl],
                                    final_kernel)
                if zf is not None:
                    p = jnp.sum(p, axis=3, keepdims=True) \
                        / zf.astype(p.dtype)
                else:
                    p = jnp.mean(p, axis=3, keepdims=True)
            projected.append(p)

        up = projected[4]
        for i, lvl in enumerate((3, 2, 1, 0)):
            dec_ext = dict(exts[lvl]) if exts[lvl] else None
            if dec_ext is not None:
                dec_ext.pop("z", None)  # depth is collapsed to 1
            with valid_extents(**(dec_ext or {})):
                up = Up(
                    ch[lvl], upfactor=UPFACTORS[i], use_bn=bn,
                    is_deconv=spec.is_deconv, dropout=drop[5 + i],
                    dtype=self.dtype,
                    name=f"up_concat{lvl + 1}")(projected[lvl], up, train)

        if self.use_1x1:
            up = nn.Conv(self.n_classes, kernel_size=(1, 1, 1),
                         kernel_init=conv_kernel_init,
                         bias_init=nn.initializers.zeros,
                         dtype=self.dtype, name="final1")(up)
        return up
