"""2D-only U-Nets over the en-face modality.

Behavioral parity with ``/root/reference/models/fpn/unets2D.py``: the 2D
encoder stages of the fusion net, with skips lifted to 5D (depth 1) and a
2D-within-3D decoder built from the *2-input* up blocks.  The base
:class:`ModifiedUnet2D` uses 3 decoder levels (conv4 is the deepest); the
Level-5 variant adds a 5th encoder stage and a 4th decoder level.
``output_features=True`` returns the pre-final feature maps (used by the
late-fusion architecture, ``fusion_nets.py:169``).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec
from multimodal_fusion_fpn_tpu.models.blocks import (
    EncoderStage, UpBlock2, conv_kernel_init, maybe_remat)
from multimodal_fusion_fpn_tpu.models.fusion import POOLS_2D
from multimodal_fusion_fpn_tpu.models.unet3d import UPFACTORS


class ModifiedUnet2D(nn.Module):
    spec: ArchSpec
    n_classes: int = 1
    output_features: bool = False
    levels: int = 4  # encoder stages: 4 (base) or 5 (Level5)
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, enface, train: bool = False):
        """enface: (B, H, W, C).  Returns (B, H, W, 1, n_classes) — or the
        (B, H, W, 1, channels[0]) features when ``output_features``."""
        spec = self.spec
        ch, drop = spec.channels, spec.dropout
        bn = spec.is_batchnorm

        Stage = maybe_remat(EncoderStage, self.remat)
        Up = maybe_remat(UpBlock2, self.remat, train_argnum=3)

        # Exact bucketing (round 4, VERDICT r3 #4): thread the en-face
        # TRUE extents ('h', 'w' in the root context) through encoder
        # pools; the 5D-lifted decoder's (3,3,1) convs see them under
        # the volume names ('y', 'x') — same machinery as the hybrid
        # fusion net (models/fusion.py).
        from multimodal_fusion_fpn_tpu.models.blocks import (
            valid_extents)
        from multimodal_fusion_fpn_tpu.models.encoder3d import (
            as_compact_2d, run_2d_encoder)
        convs2d, exts2d = run_2d_encoder(Stage, ch, drop, bn,
                                         self.dtype, enface, train,
                                         POOLS_2D, self.levels)
        skips = [as_compact_2d(v, m) for v, m in convs2d]

        # Lift 2D skips to 5D (depth 1): reference unets2D.py:124-127.
        skips = [s[:, :, :, None, :] for s in skips]

        def dec_ext(lvl):
            e = exts2d[lvl]
            if not e:
                return {}
            return {("y" if k == "h" else "x"): v for k, v in e.items()}

        up = skips[-1]
        # Decoder levels: Level5 uses up_concat4..1; base uses up_concat3..1.
        start = self.levels - 2  # deepest skip index to fuse
        for lvl in range(start, -1, -1):
            i = 3 - lvl  # index into UPFACTORS: up_concat{lvl+1}
            with valid_extents(**dec_ext(lvl)):
                up = Up(
                    ch[lvl], upfactor=UPFACTORS[i], use_bn=bn,
                    is_deconv=spec.is_deconv, dropout=drop[5 + i],
                    dtype=self.dtype,
                    name=f"up_concat{lvl + 1}")(skips[lvl], up, train)

        if self.output_features:
            return up
        return nn.Conv(self.n_classes, kernel_size=(1, 1, 1),
                       kernel_init=conv_kernel_init,
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="final1")(up)


def ModifiedUnet2DLevel5(spec: ArchSpec, n_classes: int = 1,
                         output_features: bool = False,
                         remat: bool = False,
                         dtype: Any = jnp.float32,
                         name=None) -> ModifiedUnet2D:
    return ModifiedUnet2D(spec=spec, n_classes=n_classes,
                          output_features=output_features, levels=5,
                          remat=remat, dtype=dtype, name=name)
