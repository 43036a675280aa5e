"""Reusable conv blocks (rank-agnostic: 3D volumes and 2D maps).

Behavioral parity targets in the reference:
  * ``ConvX``        ↔ ``unet3dConvX`` / ``unet2dConvX``
                       (``/root/reference/models/fpn/components.py:80-227``,
                       ``fusion3D2D.py:585-893``): N convs with BN+ReLU
                       between, BN after the last, optional 1x1(+BN)
                       projection on the residual path, add, final ReLU,
                       optional dropout.
  * ``UpBlock2``     ↔ 2-input ``unet3dUp2modified``
                       (``components.py:23-76``): nearest upsample of the
                       deeper features, concat with one skip, (3,3,1)x2
                       residual conv.
  * ``UpBlockFusion``↔ 3-input ``unet3dUp2modified`` / ``...Add``
                       (``fusion3D2D.py:897-1039``): concat [3D-skip,
                       2D-skip, up] or [(3D+2D), up].
  * ``ZDimReduction``↔ ``_make_zdimReductionConvPlusFully``
                       (``unets3D.py:356-437``): a cascade of (1,1,3)
                       stride-(1,1,2) convs followed by a (1,1,K) VALID
                       conv collapsing the depth axis.

Layouts are channels-last: 3D activations are (B, Y, X, Z, C) and kernels
are specified as (kY, kX, kZ); 2D activations are (B, H, W, C) with
kernels (kH, kW).  This matches the reference's kernel tuples after its
``permute(0,1,2,4,3)``, so e.g. the reference's (1,3,3) "within-B-scan"
kernel is (1,3,3) here as well.
"""

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_fusion_fpn_tpu.ops.upsample import upsample_nearest

Kernel = Tuple[int, ...]

# Parameter initialization mirrors the reference's from-scratch init
# (/root/reference/common/weight_init.py): xavier-normal conv kernels,
# zero conv3d bias, N(0,1) conv2d bias, BN scale ~ N(1, 0.02), BN bias 0.
conv_kernel_init = nn.initializers.xavier_normal()


def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def conv_bias_init_for_rank(ndim_spatial: int):
    if ndim_spatial == 3:
        return nn.initializers.zeros
    return nn.initializers.normal(stddev=1.0)


class ConvX(nn.Module):
    """Residual conv block.  ``kernels[i]`` applied with BN+ReLU between
    convs and BN (no ReLU) after the last; residual path is identity or a
    1x1(+BN) projection; final ReLU; optional dropout."""

    features: int
    kernels: Tuple[Kernel, ...]
    strides: Tuple[Kernel, ...]
    paddings: Tuple[Kernel, ...]
    use_bn: bool = True
    residual: bool = True
    dropout: float = 0.0
    downsample: bool = False
    downsample_strides: Optional[Kernel] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim_spatial = len(self.kernels[0])
        bias_init = conv_bias_init_for_rank(ndim_spatial)
        out = x
        n = len(self.kernels)
        for i in range(n):
            out = nn.Conv(
                self.features,
                kernel_size=self.kernels[i],
                strides=self.strides[i],
                padding=[(p, p) for p in self.paddings[i]],
                use_bias=not self.use_bn,
                kernel_init=conv_kernel_init,
                bias_init=bias_init,
                dtype=self.dtype,
                name=f"conv{i}",
            )(out)
            if self.use_bn:
                out = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9, epsilon=1e-5,
                    scale_init=bn_scale_init,
                    dtype=self.dtype,
                    name=f"bn{i}",
                )(out)
            if i < n - 1:
                out = nn.relu(out)

        if self.residual:
            if self.downsample:
                ds_strides = self.downsample_strides or (1,) * ndim_spatial
                res = nn.Conv(
                    self.features,
                    kernel_size=(1,) * ndim_spatial,
                    strides=ds_strides,
                    padding="VALID",
                    use_bias=not self.use_bn,
                    kernel_init=conv_kernel_init,
                    bias_init=bias_init,
                    dtype=self.dtype,
                    name="ds_conv",
                )(x)
                if self.use_bn:
                    res = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9, epsilon=1e-5,
                        scale_init=bn_scale_init,
                        dtype=self.dtype,
                        name="ds_bn",
                    )(res)
            else:
                res = x
            out = out + res

        out = nn.relu(out)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class EncoderStage(nn.Module):
    """The reference's '2plus3' encoder stage (``unets3D.py:187-219``,
    2D analogue ``fusion3D2D.py:261-293``): two within-B-scan convs, then
    two within-B-scan convs plus one across-B-scan conv.  ``downsample``
    is set when the channel count changes (1x1+BN projection path)."""

    features: int
    dropout: float = 0.0
    use_bn: bool = True
    downsample: bool = False
    ndim: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.ndim == 3:
            k_a = ((1, 3, 3), (1, 3, 3))
            p_a = ((0, 1, 1), (0, 1, 1))
            k_b = ((1, 3, 3), (1, 3, 3), (3, 1, 1))
            p_b = ((0, 1, 1), (0, 1, 1), (1, 0, 0))
            ones = (1, 1, 1)
        else:
            k_a = ((1, 3), (1, 3))
            p_a = ((0, 1), (0, 1))
            k_b = ((1, 3), (1, 3), (3, 1))
            p_b = ((0, 1), (0, 1), (1, 0))
            ones = (1, 1)
        x = ConvX(self.features, kernels=k_a, strides=(ones,) * 2,
                  paddings=p_a, use_bn=self.use_bn, residual=True,
                  dropout=self.dropout, downsample=self.downsample,
                  dtype=self.dtype, name="block0")(x, train)
        x = ConvX(self.features, kernels=k_b, strides=(ones,) * 3,
                  paddings=p_b, use_bn=self.use_bn, residual=True,
                  dropout=self.dropout, downsample=False,
                  dtype=self.dtype, name="block1")(x, train)
        return x


class ZDimReduction(nn.Module):
    """Depth-projection head: ``num_reductions`` (1,1,3)-stride-(1,1,2)
    convs (residual, with a strided 1x1 projection path), then a (1,1,K)
    VALID conv.  The caller takes the mean over the remaining depth."""

    features: int
    num_reductions: int
    final_kernel: int = 4
    use_bn: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.num_reductions
        if n > 0:
            x = ConvX(self.features,
                      kernels=((1, 1, 3),) * n,
                      strides=((1, 1, 2),) * n,
                      paddings=((0, 0, 1),) * n,
                      use_bn=self.use_bn, residual=True,
                      dropout=self.dropout,
                      downsample=True,
                      downsample_strides=(1, 1, 2 ** n),
                      dtype=self.dtype, name="red")(x, train)
        x = ConvX(self.features,
                  kernels=((1, 1, self.final_kernel),),
                  strides=((1, 1, 1),),
                  paddings=((0, 0, 0),),
                  use_bn=self.use_bn, residual=False,
                  dropout=self.dropout, downsample=False,
                  dtype=self.dtype, name="fully")(x, train)
        return x


def _up(x, features, upfactor, is_deconv, dtype, name):
    if is_deconv:
        return nn.ConvTranspose(features, kernel_size=upfactor,
                                strides=upfactor,
                                kernel_init=conv_kernel_init,
                                bias_init=nn.initializers.normal(1.0),
                                dtype=dtype, name=name)(x)
    return upsample_nearest(x, upfactor, axes=(1, 2, 3))


class UpBlock2(nn.Module):
    """2-input decoder block: upsample deeper, concat with one skip,
    (3,3,1)x2 residual conv with 1x1(+BN) projection path."""

    features: int
    upfactor: Tuple[int, int, int]
    use_bn: bool = True
    is_deconv: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, skip, deeper, train: bool = False):
        up = _up(deeper, self.features, self.upfactor, self.is_deconv,
                 self.dtype, "up")
        cat = jnp.concatenate([skip, up], axis=-1)
        return ConvX(self.features,
                     kernels=((3, 3, 1), (3, 3, 1)),
                     strides=((1, 1, 1),) * 2,
                     paddings=((1, 1, 0), (1, 1, 0)),
                     use_bn=self.use_bn, residual=True,
                     dropout=self.dropout, downsample=True,
                     dtype=self.dtype, name="conv")(cat, train)


class UpBlockFusion(nn.Module):
    """3-input decoder block fusing a 3D skip, a 2D skip and the deeper
    features.  ``mode='concat'`` concatenates all three; ``mode='add'``
    adds the two skips before concatenating with the upsampled deeper
    features (reference ``fusion3D2D.py:956-966,1028-1039``)."""

    features: int
    upfactor: Tuple[int, int, int]
    mode: str = "concat"
    use_bn: bool = True
    is_deconv: bool = False
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, skip3d, skip2d, deeper, train: bool = False):
        up = _up(deeper, self.features, self.upfactor, self.is_deconv,
                 self.dtype, "up")
        if self.mode == "concat":
            cat = jnp.concatenate([skip3d, skip2d, up], axis=-1)
        elif self.mode == "add":
            cat = jnp.concatenate([skip3d + skip2d, up], axis=-1)
        else:
            raise ValueError(f"Unknown feature fusion mode: {self.mode}")
        return ConvX(self.features,
                     kernels=((3, 3, 1), (3, 3, 1)),
                     strides=((1, 1, 1),) * 2,
                     paddings=((1, 1, 0), (1, 1, 0)),
                     use_bn=self.use_bn, residual=True,
                     dropout=self.dropout, downsample=True,
                     dtype=self.dtype, name="conv")(cat, train)


def maybe_remat(cls, flag: bool, train_argnum: int = 2):
    """Wrap a module class in jax.checkpoint (rematerialization) when
    ``flag`` — the TPU memory lever for the full-volume encoder stages:
    activations inside the block are recomputed during the backward pass
    instead of being kept in HBM (exact same numerics).  ``train_argnum``
    is the position of the static ``train`` flag in ``__call__``
    (self = 0)."""
    if not flag:
        return cls
    return nn.remat(cls, static_argnums=(train_argnum,))


def max_pool(x, window: Sequence[int]):
    """VALID max pool over the spatial axes (floor semantics, like torch
    ``MaxPool3d``/``MaxPool2d`` with default stride=kernel)."""
    window = tuple(window)
    return nn.max_pool(x, window_shape=window, strides=window,
                       padding="VALID")
