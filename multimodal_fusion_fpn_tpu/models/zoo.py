"""Model zoo: the 8 factory architectures.

Behavioral parity with ``/root/reference/models/fusion_nets.py`` — the
factory names are the CLI ``--model`` values.  Every model takes the batch
dict in the reference layout and returns ``{'prediction': ...}`` in the
reference layout (see :mod:`..models.layouts`).

| name                      | backbone                     | head      |
|---------------------------|------------------------------|-----------|
| FPN                       | ModifiedUnet3D               | sigmoid   |
| FPNRegression             | ModifiedUnet3D               | linear    |
| FPNClassification         | ModifiedUnet3D bottleneck    | softmax   |
| FPNHybridFusion           | ModifiedUnet3D2DLevel5       | sigmoid   |
| FPNHybridFusionRegression | ModifiedUnet3D2DLevel5       | linear    |
| FPN2D                     | ModifiedUnet2DLevel5         | sigmoid   |
| FPNLateFusion             | 3D ∥ 2D nets + 1x1x1 fuse    | sigmoid   |
| FPNLateFusionRegression   | same                         | linear    |
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec, load_arch_spec
from multimodal_fusion_fpn_tpu.models.fusion import ModifiedUnet3D2D
from multimodal_fusion_fpn_tpu.models.layouts import (
    enface_to_device, seg_from_device, volume_to_device)
from multimodal_fusion_fpn_tpu.models.unet2d import ModifiedUnet2D
from multimodal_fusion_fpn_tpu.models.unet3d import ModifiedUnet3D
from multimodal_fusion_fpn_tpu.models.blocks import conv_kernel_init
from multimodal_fusion_fpn_tpu.ops.interpolate import linear_resize
from multimodal_fusion_fpn_tpu.ops.pooling import adaptive_max_pool
from multimodal_fusion_fpn_tpu.registry import get_factory_adder

add_class, model_factory = get_factory_adder()


def interpolate_from_crop(crop: str) -> Optional[str]:
    """Derive the feature-alignment mode from the crop flag
    (reference ``fusion_nets.py:100-108,173-178``)."""
    interpolate = "2d" if "relative_2d" in crop else None
    if "max" in crop and interpolate is not None:
        interpolate += "_max"
    return interpolate




def _bucket_ctx(batch):
    """Exact-bucketing root context from the reserved batch keys
    (eval harness, --eval-shape-bucket exact mode): "__valid_image__"
    (3,) int32 true (D, H, W) of the reference input layout — device
    keys (y, z, x) — and "__valid_enface__" (2,) true (H, W) — keys
    (h, w).  Returns {} when absent (every hook becomes a no-op)."""
    ext = {}
    vv = batch.get("__valid_image__")
    if vv is not None:
        ext.update(y=vv[0], z=vv[1], x=vv[2])
    ve = batch.get("__valid_enface__")
    if ve is not None:
        ext.update(h=ve[0], w=ve[1])
    return ext


@add_class
class FPN(nn.Module):
    spec: ArchSpec
    n_classes: int = 1
    fusion_modality: Optional[str] = None
    interpolate: Optional[str] = None
    remat: bool = False
    dtype: Any = jnp.float32

    def last_activation(self, x):
        return nn.sigmoid(x)

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from multimodal_fusion_fpn_tpu.models.blocks import valid_extents
        oct = volume_to_device(batch["image"].astype(self.dtype))
        with valid_extents(**_bucket_ctx(batch)):
            seg = ModifiedUnet3D(self.spec, n_classes=self.n_classes,
                                 remat=self.remat, dtype=self.dtype,
                                 name="resensnet")(oct, train)
        seg = seg_from_device(seg)
        return {"prediction": self.last_activation(seg)}


@add_class
class FPNRegression(FPN):
    def last_activation(self, x):
        return x


@add_class
class FPNClassification(nn.Module):
    spec: ArchSpec
    n_classes: int = 1
    fusion_modality: Optional[str] = None
    interpolate: Optional[str] = None
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, train: bool = False):
        oct = volume_to_device(batch["image"].astype(self.dtype))
        feats = ModifiedUnet3D(self.spec, n_classes=self.n_classes,
                               classification=True, remat=self.remat,
                               dtype=self.dtype,
                               name="resensnet")(oct, train)
        pred = nn.Conv(self.n_classes, kernel_size=(1, 1, 1), use_bias=False,
                       kernel_init=conv_kernel_init, dtype=self.dtype,
                       name="one_one")(feats)
        pred = jnp.mean(pred, axis=(1, 2, 3))  # AdaptiveAvgPool3d((1,1,1))
        pred = nn.softmax(pred, axis=-1)
        return {"prediction": pred}


@add_class
class FPNHybridFusion(nn.Module):
    spec: ArchSpec
    n_classes: int = 1
    fusion_modality: str = "slo"
    interpolate: Optional[str] = None
    feature_fusion: str = "concat"
    remat: bool = False
    dtype: Any = jnp.float32

    def last_activation(self, x):
        return nn.sigmoid(x)

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from multimodal_fusion_fpn_tpu.models.blocks import valid_extents
        oct = volume_to_device(batch["image"].astype(self.dtype))
        enface = enface_to_device(
            batch[self.fusion_modality].astype(self.dtype))
        with valid_extents(**_bucket_ctx(batch)):
            seg = ModifiedUnet3D2D(
                self.spec, n_classes=self.n_classes,
                interpolate=self.interpolate,
                feature_fusion=self.feature_fusion, levels=5,
                remat=self.remat, dtype=self.dtype,
                name="resensnet")(oct, enface, train)
        seg = seg_from_device(seg)
        return {"prediction": self.last_activation(seg)}


@add_class
class FPNHybridFusionRegression(FPNHybridFusion):
    def last_activation(self, x):
        return x


@add_class
class FPN2D(nn.Module):
    spec: ArchSpec
    n_classes: int = 1
    fusion_modality: str = "slo"
    interpolate: Optional[str] = None
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from multimodal_fusion_fpn_tpu.models.blocks import valid_extents
        ctx = _bucket_ctx(batch)
        enface = enface_to_device(
            batch[self.fusion_modality].astype(self.dtype))
        with valid_extents(**ctx):
            seg = ModifiedUnet2D(self.spec, n_classes=self.n_classes,
                                 levels=5, remat=self.remat,
                                 dtype=self.dtype,
                                 name="resensnet")(enface, train)
        seg = seg_from_device(seg)
        seg = nn.sigmoid(seg)
        if ctx.get("h") is not None and "mask" in batch:
            # Exact bucketing: resize from the TRUE extents inside the
            # padded buffer to the (unpadded) mask resolution.  When the
            # true extents already equal the target the dynamic map is
            # the identity — matching the reference's skip-if-equal.
            # Mask-less batches skip the resize (as below) and return
            # the padded buffer; the harness crops it to true extents.
            from multimodal_fusion_fpn_tpu.ops.dynamic_extent import \
                linear_resize_dynamic
            tgt = batch["mask"].shape[2:]
            seg = linear_resize_dynamic(
                seg, (ctx["h"], None, ctx["w"]), tgt, axes=(2, 3, 4),
                out_pads=tgt)
        elif "mask" in batch and seg.shape != batch["mask"].shape:
            # Trilinear resize to the mask resolution
            # (reference fusion_nets.py:143-146).
            seg = linear_resize(seg, batch["mask"].shape[2:], axes=(2, 3, 4))
        return {"prediction": seg}


@add_class
class FPNLateFusion(nn.Module):
    spec: ArchSpec
    n_classes: int = 1
    fusion_modality: str = "slo"
    interpolate: Optional[str] = None
    output_features: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    def last_activation(self, x):
        return nn.sigmoid(x)

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from multimodal_fusion_fpn_tpu.models.blocks import valid_extents
        ctx = _bucket_ctx(batch)
        oct = volume_to_device(batch["image"].astype(self.dtype))
        with valid_extents(**ctx):
            oct_feat = ModifiedUnet3D(self.spec, n_classes=self.n_classes,
                                      use_1x1=False, remat=self.remat,
                                      dtype=self.dtype,
                                      name="resensnet3d")(oct, train)
        oct_feat = seg_from_device(oct_feat)  # (B, C0, Y, 1, X)

        enface = enface_to_device(
            batch[self.fusion_modality].astype(self.dtype))
        with valid_extents(**ctx):
            fused_feat = ModifiedUnet2D(self.spec,
                                        n_classes=self.n_classes,
                                        output_features=True, levels=5,
                                        remat=self.remat, dtype=self.dtype,
                                        name="resensnet2d")(enface, train)
        fused_feat = seg_from_device(fused_feat)  # (B, C0, H2, 1, W2)

        target = oct_feat.shape[2:]
        if ctx.get("h") is not None or ctx.get("y") is not None:
            # Exact bucketing: align the 2D branch over the TRUE extents
            # inside the padded buffers (the static ops would use the
            # padded — wrong — sizes).  A modality that needed no
            # padding contributes its static shape as the true extent.
            from multimodal_fusion_fpn_tpu.ops.dynamic_extent import (
                adaptive_max_pool_dynamic, linear_resize_dynamic)
            t_in = (ctx.get("h", fused_feat.shape[2]), None,
                    ctx.get("w", fused_feat.shape[4]))
            t_out = (ctx.get("y", target[0]), None,
                     ctx.get("x", target[2]))
            pads = (target[0], None, target[2])
            if self.interpolate == "2d":
                fused_feat = linear_resize_dynamic(
                    fused_feat, t_in, t_out, axes=(2, 3, 4), out_pads=pads)
            elif self.interpolate == "2d_max":
                fused_feat = adaptive_max_pool_dynamic(
                    fused_feat, t_in, t_out, axes=(2, 3, 4),
                    max_ratio=16, out_pads=pads)
        elif self.interpolate == "2d":
            fused_feat = linear_resize(fused_feat, target, axes=(2, 3, 4))
        elif self.interpolate == "2d_max":
            fused_feat = adaptive_max_pool(fused_feat, target, axes=(2, 3, 4))

        branch_feats = jnp.concatenate([oct_feat, fused_feat], axis=1)
        # 1x1x1 fusion conv over channels.  NOTE: the reference hard-codes
        # 32 input channels here (fusion_nets.py:172) which is only valid
        # at ini width channels[0]=16; we infer the width instead, which is
        # identical at the shipped configuration.
        cat = jnp.moveaxis(branch_feats, 1, -1)  # channels-last for the conv
        seg = nn.Conv(self.n_classes, kernel_size=(1, 1, 1),
                      kernel_init=conv_kernel_init,
                      bias_init=nn.initializers.zeros,
                      dtype=self.dtype, name="fusion_module")(cat)
        seg = jnp.moveaxis(seg, -1, 1)
        out = {"prediction": self.last_activation(seg)}
        if self.output_features:
            # Pre-fusion branch features, gradient-stopped — the
            # reference sketches this as torch.cat(...).detach()
            # (``fusion_nets.py:206-212``, commented out there; opt-in
            # here) and the eval harness renders it as features.png
            # (``test_utils.py:215-232``).
            out["out_features"] = jax.lax.stop_gradient(branch_feats)
        return out


@add_class
class FPNLateFusionRegression(FPNLateFusion):
    def last_activation(self, x):
        return x


def build_model(config, spec: Optional[ArchSpec] = None,
                dtype: Any = jnp.float32, remat: bool = True) -> nn.Module:
    """Instantiate a zoo model from a parsed config (CLI ``--model``)."""
    if spec is None:
        arch_ini = getattr(config, "arch_config", None)
        if arch_ini:
            import os
            spec = load_arch_spec(
                os.path.splitext(os.path.basename(arch_ini))[0],
                search_dir=os.path.dirname(os.path.abspath(arch_ini)))
        else:
            spec = load_arch_spec()
    cls = model_factory[config.model]
    kwargs = dict(spec=spec, n_classes=config.number_of_outputs, dtype=dtype,
                  remat=remat)
    if config.fusion_modality is not None:
        kwargs["fusion_modality"] = config.fusion_modality
    if config.model in ("FPNHybridFusion", "FPNHybridFusionRegression",
                        "FPNLateFusion", "FPNLateFusionRegression"):
        kwargs["interpolate"] = interpolate_from_crop(config.crop)
    if (config.model in ("FPNLateFusion", "FPNLateFusionRegression")
            and getattr(config, "output_features", False)):
        kwargs["output_features"] = True
    return cls(**kwargs)
