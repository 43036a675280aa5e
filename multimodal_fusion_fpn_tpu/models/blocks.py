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


class TpuConv(nn.Module):
    """Convolution with a TPU-native lowering choice.

    ``impl='auto'`` uses the banded block-matmul formulation
    (:mod:`..ops.banded`) for narrow-channel convs (C_out <= 64), which
    XLA otherwise pads 8x on the lane dim, and ``lax.conv`` for wide
    convs where the native lowering is already efficient.  Convs whose
    innermost spatial extent is 1 (the z-collapsed decoder) are computed
    as 2D convs blocked along the en-face width.  Parameter names/shapes
    match ``nn.Conv`` exactly ('kernel' (k..., Ci, Co), 'bias' (Co,)),
    so checkpoints are interchangeable between implementations.
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Tuple[int, ...]
    use_bias: bool = True
    kernel_init: Any = None
    bias_init: Any = None
    impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, blocked: bool = False):
        from multimodal_fusion_fpn_tpu.ops.banded import (banded_conv,
                                                          banded_conv_blocked)
        ci = x.shape[-1]
        co = self.features
        k = tuple(self.kernel_size)
        kernel = self.param("kernel", self.kernel_init or conv_kernel_init,
                            k + (ci, co), jnp.float32)
        bias = self.param("bias",
                          self.bias_init or nn.initializers.zeros,
                          (co,), jnp.float32) if self.use_bias else None
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)

        # In bf16 mode emit bf16 directly from the MXU (fp32 internal
        # accumulation either way) — avoids a separate convert pass per
        # conv.  fp32 mode keeps fp32 outputs (parity path).
        acc_dtype = self.dtype

        if blocked:
            # x is (B, Y, X, nb, bs, Ci) — conv stays in blocked form.
            y = banded_conv_blocked(x, kernel,
                                    preferred_element_type=acc_dtype)
            if bias is not None:
                y = y + bias.astype(self.dtype)
            return y

        use_banded = (self.impl == "banded"
                      or (self.impl == "auto" and co <= 64))
        strides = tuple(self.strides)
        if use_banded and k[-1] == 1 and strides[-1] > 1 \
                and self.padding[-1] == 0:
            # kz=1 strided conv == conv on the z-sliced input (avoids the
            # huge banded window of strided blocks).
            sl = [slice(None)] * x.ndim
            sl[-2] = slice(0, None, strides[-1])
            x = x[tuple(sl)]
            strides = strides[:-1] + (1,)
        if use_banded:
            block = 8
            squeeze_z = (x.ndim == 5 and x.shape[3] == 1 and k[-1] == 1)
            if squeeze_z:
                # z-collapsed decoder: 2D conv blocked along width X
                y = banded_conv(x[:, :, :, 0, :], kernel[..., 0, :, :],
                                strides[:-1], self.padding[:-1],
                                block=block,
                                preferred_element_type=acc_dtype)
                y = y[:, :, :, None, :]
            else:
                y = banded_conv(x, kernel, strides, self.padding,
                                block=block,
                                preferred_element_type=acc_dtype)
        else:
            nsp = len(k)
            lhs_spec = "N" + "DHW"[3 - nsp:] + "C"
            rhs_spec = "DHW"[3 - nsp:] + "IO"
            y = jax.lax.conv_general_dilated(
                x, kernel, tuple(self.strides),
                [(p, p) for p in self.padding],
                dimension_numbers=(lhs_spec, rhs_spec, lhs_spec),
                preferred_element_type=self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


import os as _os

_FUSED_MODE = _os.environ.get("MMF_FUSED", "auto")  # "on"|"off"|"auto" (TPU only)


def set_fused_stage_mode(mode: str) -> None:
    """Select the encoder-stage lowering: 'on' runs the fused Pallas
    chain everywhere (XLA reference impl off-TPU), 'off' the per-op
    blocked path, 'auto' fuses only when the default backend is TPU."""
    global _FUSED_MODE
    assert mode in ("on", "off", "auto"), mode
    _FUSED_MODE = mode


def _fused_active() -> bool:
    if _FUSED_MODE == "off":
        return False
    if _FUSED_MODE == "auto":
        return jax.default_backend() == "tpu"
    return True


# ---------------------------------------------------------------------------
# Exact shape bucketing (eval-only): a dynamic valid-extent context.
#
# Bucketed whole-volume eval pads inputs to bucket shapes and threads the
# TRUE extents (dynamic scalars) through the model; every conv/BN output
# is re-zeroed beyond the true extents so the SAME-conv boundary reads
# zeros exactly like the unbucketed run.  The context is None outside
# exact-bucketed eval — all hooks are no-ops then.  The fused kernels
# stay live under bucketing: they take the dynamic true extents via
# SMEM and re-zero their affine prologue beyond them (fused_conv_dyn;
# see stage_dyn_extents below), falling back to the per-op lowering
# only under a space mesh.

_VALID_CTX = []  # stack of dicts {axis_name: dynamic extent or None}


class valid_extents:
    """Context manager pushing the CURRENT tensor's true extents.

    3D volumes use keys (y, x, z) for (B, Y, X, Z, C); 2D maps use
    (h, w) for (B, H, W, C).  Values are dynamic int32 scalars (or
    None for full dims)."""

    def __init__(self, **ext):
        self.ext = {k: v for k, v in ext.items() if v is not None}

    def __enter__(self):
        _VALID_CTX.append(self.ext if self.ext else None)
        return self

    def __exit__(self, *exc):
        _VALID_CTX.pop()


def current_valid():
    return _VALID_CTX[-1] if _VALID_CTX else None


def mask_to_valid(x):
    """Zero ``x`` beyond the current valid extents (no-op without an
    active exact-bucketing context)."""
    ext = current_valid()
    if not ext:
        return x
    from multimodal_fusion_fpn_tpu.ops.dynamic_extent import mask_valid
    if x.ndim == 5:
        axis_of = {"y": 1, "x": 2, "z": 3}
    elif x.ndim == 4:
        axis_of = {"h": 1, "w": 2}
    else:
        return x
    extents = {axis_of[k]: v for k, v in ext.items() if k in axis_of}
    return mask_valid(x, extents) if extents else x


def stage_dyn_extents(train: bool):
    """The (yt, xt, zt) dynamic extents for the FUSED eval path under
    exact bucketing, or None when the per-op path must run (training,
    no/partial context, or a space mesh).  Round 4: bucketed eval keeps
    the fused kernels — their prologues re-zero beyond the true extents
    (fused_conv.fused_conv_dyn)."""
    if train:
        return None
    ext = current_valid()
    if not ext or any(k not in ext for k in ("y", "x", "z")):
        return None
    from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc
    if fc._SPACE is not None:
        return None
    return (ext["y"], ext["x"], ext["z"])


def fused_stage_bs(z: int, features: int, use_bn: bool, dropout: float,
                   ndim: int, dynamic_ok: bool = False) -> Optional[int]:
    """The fused-chain block size an EncoderStage will pick for a given
    depth extent — or None when the stage runs the per-op path.  Shared
    by the stage itself and by the packed-encoder plumbing (the caller
    must predict whether a stage's output is packed and at which bs).

    ``dynamic_ok``: an exact-bucketing context does not force the
    per-op path (the caller runs the extent-masked eval kernels).

    ``ndim == 2`` (the en-face encoder) rides the SAME 3D kernels with a
    singleton X and z = W: a 2D kernel (kh, kw) is computed as
    (kh, 1, kw) — (1,3) is a z-banded conv, (3,1) a y-chunk conv —
    while the PARAMETER keeps its 2D shape (checkpoint/torch-import
    parity).  Callers pass z = W."""
    if not _fused_active():
        return None
    if current_valid() and not dynamic_ok:
        return None
    if ndim not in (2, 3) or features > 64:
        return None
    if ndim == 2 and _os.environ.get("MMF_FUSED_2D", "1") == "0":
        return None  # on-chip A/B escape hatch (tools/onchip_r4.py)
    if not use_bn or dropout > 0.0:
        return None
    # Prefer bs*C = 128 (one MXU tile): band-dot FLOPs scale LINEARLY
    # with bs, so the smallest full-lane block wins (measured bf16 fwd:
    # s2 c32 bs8 4.9 -> bs4 3.8 ms; s3 c64 bs4 4.0 -> bs2 3.4 ms).
    preferred = max(2, min(8, 128 // max(1, features)))
    for bs in sorted({preferred, 8, 4, 2},
                     key=lambda b: (b != preferred, -b)):
        if z % bs == 0 and z > bs:
            return bs
    return None


class _ConvKernel(nn.Module):
    """Parameter shell: declares the same 'kernel' param as TpuConv
    (same name, shape, init -> identical param tree and RNG folding), so
    the fused chain and the per-op path share checkpoints."""

    kernel_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kernel_init, self.kernel_shape,
                          jnp.float32)


class _BNFold(nn.Module):
    """BatchNorm that RETURNS the folded affine (s, b) instead of
    applying it: y_norm = y * s + b with s = scale/sqrt(var+eps),
    b = bias - mean*s.  Parameter/collection layout is identical to
    the per-op ``TorchBatchNorm`` (params scale/bias, batch_stats
    mean/var, same momentum/epsilon/running-average update), so
    checkpoints are interchangeable with the per-op path.

    ``n`` is the batch-element count behind ``var``: torch BatchNorm
    (the reference's ``torch.nn.BatchNorm3d``) normalizes by the BIASED
    batch variance but updates running_var with the UNBIASED one
    (x n/(n-1)) — measured against the torch trajectory in
    tests/test_training_dynamics.py."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, mean, var, train: bool, n: Optional[int] = None):
        c = self.features
        scale = self.param("scale", bn_scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda *_: jnp.zeros((c,), jnp.float32),
                                None)
        ra_var = self.variable("batch_stats", "var",
                               lambda *_: jnp.ones((c,), jnp.float32),
                               None)
        if train:
            if not self.is_initializing():
                m = self.momentum
                va = var if n is None or n <= 1 else var * (n / (n - 1))
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * va
            use_mean, use_var = mean, var
        else:
            use_mean, use_var = ra_mean.value, ra_var.value
        s = scale * jax.lax.rsqrt(use_var + self.epsilon)
        return s, bias - use_mean * s


class TorchBatchNorm(nn.Module):
    """Drop-in for ``nn.BatchNorm`` with torch running-stat semantics:
    normalization uses the biased batch variance, the running_var EMA
    uses the UNBIASED one (``torch.nn.BatchNorm{2,3}d`` default —
    flax's BatchNorm uses biased for both, which drifts eval behavior
    off any reference-trained net).  Same param/collection layout."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Any = nn.initializers.ones
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda *_: jnp.zeros((c,), jnp.float32),
                                None)
        ra_var = self.variable("batch_stats", "var",
                               lambda *_: jnp.ones((c,), jnp.float32),
                               None)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            n = x.size // c
            if not self.is_initializing():
                m = self.momentum
                va = var if n <= 1 else var * (n / (n - 1))
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * va
        s = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * s
        return x * s.astype(x.dtype) + b.astype(x.dtype)


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

    def _blocked_block_size(self, x) -> Optional[int]:
        """Pick a z-block size for the blocked fast path, or None.

        The whole ConvX chain (convs, BN, ReLU, residual) runs on
        z-blocked activations when every conv is a stride-1 SAME conv
        with taps in {1,3}, the channel count is narrow, and z divides
        by a usable block size — i.e. the full-volume encoder stages,
        which otherwise materialize 8x-padded (.., Z, C) intermediates.
        """
        if current_valid():
            return None  # exact bucketing needs the per-conv masks
        if x.ndim not in (4, 5) or self.features > 64:
            return None
        nsp = x.ndim - 2  # 3 for volumes (block z), 2 for 2D (block W)
        z = x.shape[-2]
        for k, s, p in zip(self.kernels, self.strides, self.paddings):
            if len(k) != nsp or any(kk not in (1, 3) for kk in k):
                return None
            if any(ss != 1 for ss in s):
                return None
            if tuple(p) != tuple(kk // 2 for kk in k):
                return None
        if self.downsample and self.downsample_strides not in (
                None, (1,) * nsp):
            return None
        # Largest dividing block: the banded dots are memory-bound, so
        # traffic (patch volume = (bs+2)/bs of the activation) beats FLOP
        # expansion.  Measured: bs ~ 128/C_out (2x/1.33x less FLOPs at
        # C=32/64) is net SLOWER (s3 fwd 23.7 -> 30.0 ms) because the
        # patch volume grows to 1.5x/2x — see PERF.md round 2.
        for bs in (8, 4, 2):
            if z % bs == 0 and z > bs:
                return bs
        return None

    def _fused_packed(self, x, X: int, nb: int, bs: int, train: bool,
                      input_packed: bool, dyn=None):
        """Fused-chain lowering on the padded thick layout (see
        ops/pallas/fused_conv.py): each conv is one kernel invocation
        computing conv(relu(affine(prev_raw))); BatchNorm is folded into
        the next conv's affine, with stats as one XLA reduction over the
        raw output.  Same parameter tree as the per-op path.

        When the stage input is NARROW (ci < 8, e.g. the 1-channel OCT
        volume), the thick packing of the input would pad 8*ci -> 128
        lanes in HBM (16x for ci=1); the first conv and the 1x1
        downsample conv then run on the existing banded path from the
        compact layout and only their RAW outputs are packed.
        """
        from multimodal_fusion_fpn_tpu.ops.banded import banded_conv
        from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import (
            fused_conv, fused_conv_dyn, interior_stats, mask_packed_dyn,
            pack)
        assert dyn is None or not train, \
            "dynamic-extent fused path is eval-only"
        n = len(self.kernels)
        co = self.features
        dt = self.dtype
        nsp = len(self.kernels[0])

        if input_packed:
            xp = x
            ci0 = x.shape[-1] // bs
            narrow = False
        else:
            ci0 = x.shape[-1]
            narrow = ci0 < 8
            x = x.astype(dt)
            if nsp == 2:
                # en-face block as a singleton-X 3D block (z = W); the
                # PARAM shapes stay 2D — see fused_stage_bs
                x = x[:, :, None]
            if narrow and self.residual and not self.downsample:
                narrow = False  # identity residual needs the packed input
            xp = None if narrow else pack(x, bs)
        B, Y = x.shape[0], x.shape[1]

        def w3(w, w_shape):
            """Reshape a 2D conv param (kh, kw, ci, co) to its compute
            shape (kh, 1, kw, ci, co); identity for 3D params."""
            if nsp == 2:
                return w.reshape((w_shape[0], 1, w_shape[1])
                                 + tuple(w_shape[2:]))
            return w

        # out_stats: the kernel's epilogue returns the raw output's
        # per-lane (sum, sum^2), saving the separate interior_stats
        # full-buffer read; the backward folds the stats cotangent
        # into the dx/dband kernel prologues (fused_conv.py r4).
        # MMF_FUSED_STATS=0 keeps the old separate-read path for
        # on-chip A/Bs.  TRAIN-only: in eval the batch stats are never
        # consumed (_BNFold uses the running averages) — the per-op
        # XLA reduction is DCE'd for free, whereas a kernel-epilogue
        # accumulator would still be computed (opaque to XLA) and
        # would misbehave under the ensemble eval's vmap (the step==0
        # init logic assumes the unbatched grid).
        use_ws = (train and dyn is None
                  and _os.environ.get("MMF_FUSED_STATS", "1") != "0")

        def conv(inputs, scales, biases, w_shape, name, relu):
            w = w3(_ConvKernel(w_shape, name=name)(), w_shape)
            if dyn is not None:
                return fused_conv_dyn(inputs, scales, biases,
                                      w.astype(dt), X, nb, bs, dyn,
                                      relu=relu,
                                      preferred_element_type=dt)
            return fused_conv(inputs, scales, biases, w.astype(dt), X,
                              nb, bs, relu=relu,
                              preferred_element_type=dt,
                              out_stats=use_ws)

        def conv_narrow(w_shape, name):
            # raw conv from the compact layout, emitted DIRECTLY in the
            # packed thick layout (banded's dot output is already
            # (..., nb, bs*co); the compact round trip cost two 260 MB
            # layout copies per conv in the step HLO).
            w = w3(_ConvKernel(w_shape, name=name)(), w_shape)
            k = w.shape[:3]
            return banded_conv(x, w.astype(dt), (1,) * 3,
                               tuple(kk // 2 for kk in k), block=bs,
                               preferred_element_type=dt,
                               packed_out=True)

        def bn(y_raw, name):
            if y_raw is None or dyn is not None:
                # eval: only the RUNNING stats feed the affine — skip
                # the batch-stat reduction (under dynamic extents it
                # would also be polluted by the padding; for a fused
                # conv pair the intermediate never exists).
                assert not train
                z = jnp.zeros((co,), jnp.float32)
                return bn_fold(z, z, name)
            mean, var = interior_stats(y_raw, X, nb, bs, B, Y)
            return bn_fold(mean, var, name)

        def bn_sums(s1, s2, name):
            # fold the kernel-epilogue per-lane sums (1, bs*co) to
            # per-logical-channel stats — same (slot, channel) lane
            # order as interior_stats.
            n_el = B * Y * X * nb * bs
            s1c = s1.reshape(bs, co).sum(0)
            s2c = s2.reshape(bs, co).sum(0)
            mean = s1c / n_el
            var = s2c / n_el - jnp.square(mean)
            return bn_fold(mean, var, name)

        def bn_fold(mean, var, name):
            s, b = _BNFold(co, name=name)(mean, var, train,
                                          n=B * Y * X * nb * bs)
            return (jnp.tile(s, bs).astype(dt),
                    jnp.tile(b, bs).astype(dt))

        # Eval-only 2-conv mega-kernel (MMF_FUSED_PAIR=1, PERF.md
        # roadmap 3): consecutive kY==1 convs run in one kernel with
        # the intermediate VMEM-resident — possible because the eval
        # affines come from RUNNING stats.  Opt-in until the Mosaic
        # compile is verified on chip (tools/onchip_r4.py).
        def _no_space_mesh():
            from multimodal_fusion_fpn_tpu.ops.pallas import \
                fused_conv as fc
            return fc._SPACE is None

        pair_ok = (not train and nsp == 3
                   and _os.environ.get("MMF_FUSED_PAIR", "0") == "1"
                   and _no_space_mesh())

        # Eval-only whole-block chain kernel (MMF_FUSED_CHAIN=1,
        # supersedes the 2-conv pair): ALL convs of the block plus the
        # downsample residual and the final ReLU in ONE kernel — every
        # intermediate stays in VMEM; the trailing (3,1,1) conv rides
        # the Y-chunk halo structure.  Opt-in until the Mosaic compile
        # is verified on chip (tools/onchip_r4.py).
        # Both eval mega-kernels fall back to the per-conv fused path
        # under a space mesh (which those kernels fully support) instead
        # of tripping the asserts in fused_conv2_eval/fused_chain_eval.
        chain_ok = (not train and nsp == 3
                    and _os.environ.get("MMF_FUSED_CHAIN", "0") == "1"
                    and _no_space_mesh())
        if chain_ok and n - (1 if narrow else 0) >= 2:
            from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv \
                import fused_chain_eval
            if narrow:
                y0 = conv_narrow(tuple(self.kernels[0]) + (ci0, co),
                                 "conv0")
                s0, b0 = bn(None, "bn0")
                xin, en_s, en_b, relu0, start = y0, s0, b0, True, 1
            else:
                xin, en_s, en_b, relu0, start = xp, None, None, False, 0
            convs = []
            ci_j = co if narrow else ci0
            for i in range(start, n):
                w = _ConvKernel(tuple(self.kernels[i]) + (ci_j, co),
                                name=f"conv{i}")()
                s_i, b_i = bn(None, f"bn{i}")
                convs.append((w.astype(dt), s_i, b_i))
                ci_j = co
            if narrow:
                final, ds_p = "affine", None
            elif self.residual and self.downsample:
                wd = _ConvKernel((1,) * nsp + (ci0, co),
                                 name="ds_conv")()
                sd, bd = bn(None, "ds_bn")
                final, ds_p = "res_conv", (wd.astype(dt), sd, bd)
            elif self.residual:
                final, ds_p = "res_id", None
            else:
                final, ds_p = "relu", None
            out = fused_chain_eval(xin, en_s, en_b, relu0, convs,
                                   final, ds_p, X, nb, bs,
                                   preferred_element_type=dt,
                                   dyn_extents=dyn)
            if final == "affine":
                # narrow start: the residual stays on the compact
                # banded ds path; epilogue in XLA as per-conv.
                if self.residual:
                    if self.downsample:
                        yd = conv_narrow((1,) * nsp + (ci0, co),
                                         "ds_conv")
                        sd, bd = bn(yd, "ds_bn")
                        out = out + yd * sd + bd
                    else:
                        out = out + xp
                out = nn.relu(out)
            if dyn is not None:
                out = mask_packed_dyn(out, X, nb, bs, dyn)
            return out

        ci = ci0
        cur, cur_s, cur_b = xp, None, None
        i = 0
        while i < n:
            w_shape = tuple(self.kernels[i]) + (ci, co)
            if i == 0 and narrow:
                y = conv_narrow(w_shape, "conv0")
                cur_s, cur_b = bn(y, f"bn{i}")
            elif (pair_ok and i + 1 < n and self.kernels[i][0] == 1
                    and self.kernels[i + 1][0] == 1):
                from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv \
                    import fused_conv2_eval
                w0 = _ConvKernel(w_shape, name=f"conv{i}")()
                s_mid, b_mid = bn(None, f"bn{i}")
                w1 = _ConvKernel(tuple(self.kernels[i + 1]) + (co, co),
                                 name=f"conv{i + 1}")()
                y = fused_conv2_eval(cur, cur_s, cur_b, w0.astype(dt),
                                     s_mid, b_mid, w1.astype(dt), X,
                                     nb, bs, relu0=(i > 0),
                                     preferred_element_type=dt,
                                     dyn_extents=dyn)
                cur_s, cur_b = bn(None, f"bn{i + 1}")
                cur, ci = y, co
                i += 2
                continue
            elif use_ws:
                y, s1, s2 = conv([cur], [cur_s], [cur_b], w_shape,
                                 f"conv{i}", relu=(i > 0))
                cur_s, cur_b = bn_sums(s1, s2, f"bn{i}")
            else:
                y = conv([cur], [cur_s], [cur_b], w_shape, f"conv{i}",
                         relu=(i > 0))
                cur_s, cur_b = bn(y, f"bn{i}")
            cur, ci = y, co
            i += 1

        out = cur * cur_s + cur_b
        if self.residual:
            if self.downsample:
                wd_shape = (1,) * nsp + (ci0, co)
                if narrow:
                    yd = conv_narrow(wd_shape, "ds_conv")
                    sd, bd = bn(yd, "ds_bn")
                elif use_ws:
                    yd, sd1, sd2 = conv([xp], [None], [None], wd_shape,
                                        "ds_conv", relu=False)
                    sd, bd = bn_sums(sd1, sd2, "ds_bn")
                else:
                    yd = conv([xp], [None], [None], wd_shape, "ds_conv",
                              relu=False)
                    sd, bd = bn(yd, "ds_bn")
                out = out + yd * sd + bd
            else:
                out = out + xp
        out = nn.relu(out)
        if dyn is not None:
            # the affine epilogue re-introduces bias garbage beyond the
            # true extents; per-op consumers (pools, projections, the
            # next stage's prologue recheck) assume masked buffers.
            out = mask_packed_dyn(out, X, nb, bs, dyn)
        # padless layout: every row is real data, no interior re-mask
        return out

    def _ext_after(self, ext, kernel, strides, padding):
        """Advance the true-extent dict through one conv (standard conv
        arithmetic on the DYNAMIC extents — exactly the unbucketed
        run's output sizes)."""
        if not ext:
            return ext
        names = ("y", "x", "z") if len(kernel) == 3 else ("h", "w")
        new = dict(ext)
        for name, k, s, p in zip(names, kernel, strides, padding):
            if name in new:
                new[name] = (new[name] + 2 * p - k) // s + 1
        return new

    @nn.compact
    def __call__(self, x, train: bool = False, packed_meta=None):
        if packed_meta is not None:
            X, nb, bs, input_packed = packed_meta[:4]
            dyn = packed_meta[4] if len(packed_meta) > 4 else None
            return self._fused_packed(x, X, nb, bs, train, input_packed,
                                      dyn=dyn)
        ndim_spatial = len(self.kernels[0])
        bias_init = conv_bias_init_for_rank(ndim_spatial)
        bs = self._blocked_block_size(x)
        blocked = bs is not None
        if blocked:
            z, c = x.shape[-2], x.shape[-1]
            x = x.reshape(x.shape[:-2] + (z // bs, bs, c))
        out = x
        n = len(self.kernels)
        ext = current_valid()  # exact-bucketing: advances per conv

        def mask(t, e):
            if not e:
                return t
            from multimodal_fusion_fpn_tpu.ops.dynamic_extent import \
                mask_valid
            axis_of = ({"y": 1, "x": 2, "z": 3} if t.ndim == 5
                       else {"h": 1, "w": 2})
            return mask_valid(t, {axis_of[k]: v for k, v in e.items()
                                  if k in axis_of})

        for i in range(n):
            out = TpuConv(
                self.features,
                kernel_size=self.kernels[i],
                strides=self.strides[i],
                padding=self.paddings[i],
                use_bias=not self.use_bn,
                kernel_init=conv_kernel_init,
                bias_init=bias_init,
                dtype=self.dtype,
                name=f"conv{i}",
            )(out, blocked=blocked)
            if self.use_bn:
                out = TorchBatchNorm(
                    use_running_average=not train,
                    momentum=0.9, epsilon=1e-5,
                    scale_init=bn_scale_init,
                    dtype=self.dtype,
                    name=f"bn{i}",
                )(out)
            if ext:
                ext = self._ext_after(ext, self.kernels[i],
                                      self.strides[i], self.paddings[i])
                out = mask(out, ext)
            if i < n - 1:
                out = nn.relu(out)

        if self.residual:
            if self.downsample:
                ds_strides = self.downsample_strides or (1,) * ndim_spatial
                res = TpuConv(
                    self.features,
                    kernel_size=(1,) * ndim_spatial,
                    strides=ds_strides,
                    padding=(0,) * ndim_spatial,
                    use_bias=not self.use_bn,
                    kernel_init=conv_kernel_init,
                    bias_init=bias_init,
                    dtype=self.dtype,
                    name="ds_conv",
                )(x, blocked=blocked)
                if self.use_bn:
                    res = TorchBatchNorm(
                        use_running_average=not train,
                        momentum=0.9, epsilon=1e-5,
                        scale_init=bn_scale_init,
                        dtype=self.dtype,
                        name="ds_bn",
                    )(res)
                if ext:
                    res = mask(res, ext)
            else:
                res = x
            out = out + res

        out = nn.relu(out)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if blocked:
            nb, bsz, co = out.shape[-3], out.shape[-2], out.shape[-1]
            out = out.reshape(out.shape[:-3] + (nb * bsz, co))
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

    # When the INPUT is already a packed thick buffer, its (X, nb, bs)
    # meta (module attribute: static by construction, so the call
    # signature stays remat-compatible).  keep_packed returns the raw
    # packed output; the caller recovers the meta via fused_stage_bs.
    packed_in: Optional[Tuple[int, int, int]] = None
    keep_packed: bool = False

    def _fused_eligible(self, x, train: bool = False):
        """The fused-chain lowering applies under the same conditions as
        the blocked fast path (3D, narrow channels, dividing z) plus
        BN-on / dropout-off (BN folding is what the fusion exploits).
        Returns (bs, dyn_extents) — dyn is the (yt, xt, zt) tuple when
        the stage runs the extent-masked EVAL kernels under exact
        bucketing, else None."""
        if self.packed_in is not None:
            X, nb, bs_in = self.packed_in
            z = nb * bs_in
        elif x.ndim == 5 and self.ndim == 3:
            X, z = x.shape[2], x.shape[3]
        elif x.ndim == 4 and self.ndim == 2:
            # en-face stage as a singleton-X 3D stage: z = W
            X, z = 1, x.shape[2]
        else:
            return None, None
        from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import (
            active_space_shards)
        if X % active_space_shards() != 0:
            return None, None
        if self.ndim == 2:
            # exact bucketing keeps the (proven) per-op path in 2D
            if current_valid():
                return None, None
            dyn = None
        else:
            dyn = stage_dyn_extents(train)
        bs = fused_stage_bs(z, self.features, self.use_bn,
                            self.dropout, self.ndim,
                            dynamic_ok=dyn is not None)
        return bs, (dyn if bs is not None else None)

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
        bs, dyn = self._fused_eligible(x, train)
        block0 = ConvX(self.features, kernels=k_a, strides=(ones,) * 2,
                       paddings=p_a, use_bn=self.use_bn, residual=True,
                       dropout=self.dropout, downsample=self.downsample,
                       dtype=self.dtype, name="block0")
        block1 = ConvX(self.features, kernels=k_b, strides=(ones,) * 3,
                       paddings=p_b, use_bn=self.use_bn, residual=True,
                       dropout=self.dropout, downsample=False,
                       dtype=self.dtype, name="block1")
        if bs is not None:
            from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import (
                unpack)
            from multimodal_fusion_fpn_tpu.ops.pallas.pool import (
                retarget_bs)
            if self.packed_in is not None:
                X, nb_in, bs_in = self.packed_in
                if bs_in != bs:  # free re-view at this stage's bs
                    xin, nb = retarget_bs(x, X, nb_in, bs_in, bs)
                else:
                    xin, nb = x, nb_in
                xp = block0(xin, train,
                            packed_meta=(X, nb, bs, True, dyn))
            elif self.ndim == 2:
                # singleton-X mapping: rows = nb = W/bs (fused_stage_bs)
                X, nb = 1, x.shape[2] // bs
                xp = block0(x, train,
                            packed_meta=(X, nb, bs, False, dyn))
            else:
                B, Y, X, Z, _ = x.shape
                nb = Z // bs
                xp = block0(x, train,
                            packed_meta=(X, nb, bs, False, dyn))
            xp = block1(xp, train, packed_meta=(X, nb, bs, True, dyn))
            if self.keep_packed:
                return xp
            out = unpack(xp, X, nb, bs)
            if self.ndim == 2:
                out = out.reshape(out.shape[0], out.shape[1],
                                  out.shape[3], out.shape[4])
            return out
        if self.packed_in is not None:
            from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import (
                unpack)
            X, nb_in, bs_in = self.packed_in
            x = unpack(x, X, nb_in, bs_in)
            if self.ndim == 2:
                x = x.reshape(x.shape[0], x.shape[1], x.shape[3],
                              x.shape[4])
        x = block0(x, train)
        x = block1(x, train)
        return x


class _FusedReduction(nn.Module):
    """Fused lowering of the projection cascade's 'red' ConvX: the n
    stride-2 (1,1,3) convs run as fused kernels on the thick layout with
    shrinking valid-slot counts (halving per reduction), BatchNorm
    folded like the encoder chain.  When the slot count bottoms out
    (valid < 2, e.g. the 4th reduction of zdimRed1 at bs=8) the
    remaining convs run on the compacted array via the classic per-op
    path; the strided 1x1 downsample always does (it is a cheap sliced
    conv).  Parameter tree identical to ConvX(kernels=((1,1,3),)*n,
    strides=((1,1,2),)*n, downsample_strides=(1,1,2**n))."""

    features: int
    n: int
    bs: int
    use_bn: bool = True
    dtype: Any = jnp.float32
    packed_in: Optional[Tuple[int, int, int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False, dyn=None):
        from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import (
            fused_conv_strided, fused_conv_strided_dyn,
            interior_stats_slots, merge_slots, pack, unpack,
            unpack_slots)
        from multimodal_fusion_fpn_tpu.ops.pallas.pool import retarget_bs
        assert dyn is None or not train, \
            "dynamic-extent fused cascade is eval-only"
        bs = self.bs
        if self.packed_in is not None:
            X, nb_in, bs_in = self.packed_in
            B, Y = x.shape[0], x.shape[1]
            Z = nb_in * bs_in
            ci0 = x.shape[-1] // bs_in
            x_compact = None  # materialized lazily for the ds path
        else:
            B, Y, X, Z, ci0 = x.shape
            x_compact = x
        co = self.features
        dt = self.dtype
        n = self.n
        cap = int(_os.environ.get("MMF_FUSED_PROJ_CAP", "99"))
        # feasible fused depth: each level needs >= 2 live slots; a
        # block-pair merge (below) resets the live count to bs, so
        # even block counts extend the reach beyond log2(bs) levels.
        r_possible, sim_nb, sim_valid = 0, Z // bs, bs
        while r_possible < n and sim_valid >= 2:
            sim_valid //= 2
            if sim_valid == bs // 2 and sim_nb % 2 == 0:
                sim_nb //= 2
                sim_valid = bs
            r_possible += 1
        r_fused = min(r_possible, cap)

        stride = 2 ** n
        if self.packed_in is not None:
            x = x.astype(dt)
            if bs_in != bs:
                xp, _ = retarget_bs(x, X, nb_in, bs_in, bs)
            else:
                xp = x
            # ds path: z-stride-2**n 1x1 conv.  Slice in PACKED
            # coordinates (z = m*bs + j) so only the 1/stride of the
            # data it reads is ever gathered — the unpack view forced
            # two full-size layout copies in the step HLO.
            xt = x.reshape(x.shape[0], x.shape[1], X, nb_in, bs_in, ci0)
            if stride % bs_in == 0:
                x_ds = xt[:, :, :, ::stride // bs_in, :1, :]
            elif bs_in % stride == 0:
                x_ds = xt[:, :, :, :, ::stride, :]
            else:
                x_ds = None
            if x_ds is not None:
                x_ds = x_ds.reshape(x.shape[0], x.shape[1], X, -1, ci0)
                ds_strides = (1, 1, 1)
            else:
                x_ds = unpack(x, X, nb_in, bs_in)
                ds_strides = (1, 1, stride)
        else:
            x = x.astype(dt)
            xp = pack(x, bs)
            x_ds = x
            ds_strides = (1, 1, stride)

        # TRAIN-only for the same reasons as the encoder chain: eval
        # ignores batch stats, and the kernel-epilogue accumulators are
        # not DCE-able / not ensemble-vmap-safe.
        use_ws = (train and dyn is None
                  and _os.environ.get("MMF_FUSED_STATS", "1") != "0")

        def bn_zero(name):
            # eval under dynamic extents: running stats only
            z0 = jnp.zeros((co,), jnp.float32)
            s, b = _BNFold(co, name=name)(z0, z0, train, n=1)
            return (jnp.tile(s, bs).astype(dt),
                    jnp.tile(b, bs).astype(dt))

        def bn_sums(s1, s2, c_nb, valid, name):
            # kernel-epilogue per-lane sums: dead slots are structural
            # zeros (band columns), so folding all bs slots is exact —
            # only the divisor uses the true live count (invariant
            # under merge_slots: it only rearranges live data).
            n_el = B * Y * X * c_nb * valid
            s1c = s1.reshape(bs, co).sum(0)
            s2c = s2.reshape(bs, co).sum(0)
            mean = s1c / n_el
            var = s2c / n_el - jnp.square(mean)
            s, b = _BNFold(co, name=name)(mean, var, train, n=n_el)
            return (jnp.tile(s, bs).astype(dt),
                    jnp.tile(b, bs).astype(dt))

        def bn_slots(y_raw, c_nb, valid, name):
            mean, var = interior_stats_slots(y_raw, X, c_nb, bs, valid,
                                             B, Y)
            s, b = _BNFold(co, name=name)(mean, var, train,
                                          n=B * Y * X * c_nb * valid)
            return (jnp.tile(s, bs).astype(dt),
                    jnp.tile(b, bs).astype(dt))

        # After each stride-2 level the live slots halve; whenever the
        # block count is even, merge block PAIRS back to dense full-slot
        # blocks (merge_slots) so every later level's dots run on a
        # half-size dense buffer instead of a slot-sparse full-width
        # one (the round-2 measured loss of the all-fused cascade).
        cur_nb, valid = Z // bs, bs
        cur, cur_s, cur_b = xp, None, None
        ci = ci0
        zt = dyn[2] if dyn is not None else None  # true z, per level
        for i in range(r_fused):
            w = _ConvKernel((1, 1, 3, ci, co), name=f"conv{i}")()
            if dyn is not None:
                y = fused_conv_strided_dyn(
                    [cur], [cur_s], [cur_b], w.astype(dt), X, cur_nb,
                    bs, valid_in=valid, dyn_extents=(dyn[0], dyn[1], zt),
                    relu=(i > 0), preferred_element_type=dt)
                s1 = s2 = None
                zt = (zt + 1) // 2  # stride-2 SAME k=3 true extent
            else:
                res = fused_conv_strided(
                    [cur], [cur_s], [cur_b], w.astype(dt), X, cur_nb,
                    bs, valid_in=valid, relu=(i > 0),
                    preferred_element_type=dt, out_stats=use_ws)
                y, s1, s2 = res if use_ws else (res, None, None)
            valid //= 2
            if valid == bs // 2 and cur_nb % 2 == 0:
                y = merge_slots(y, X, cur_nb, bs, valid)
                cur_nb //= 2
                valid = bs
            if dyn is not None:
                cur_s, cur_b = bn_zero(f"bn{i}")
            elif use_ws:
                cur_s, cur_b = bn_sums(s1, s2, cur_nb, valid, f"bn{i}")
            else:
                cur_s, cur_b = bn_slots(y, cur_nb, valid, f"bn{i}")
            cur, ci = y, co

        y_small = unpack_slots(cur, X, cur_nb, bs, valid)
        last = y_small * cur_s[:co] + cur_b[:co]

        def dyn_mask5(t, z_true):
            # compact (B, Y, X, z, C): zero beyond (yt, xt, z_true) —
            # the affine/conv garbage must not leak into the VALID
            # final conv or the masked depth-mean
            from multimodal_fusion_fpn_tpu.ops.dynamic_extent import \
                mask_valid
            return mask_valid(t, {1: dyn[0], 2: dyn[1], 3: z_true})

        if dyn is not None:
            last = dyn_mask5(last, zt)
        if r_fused < n:
            t = nn.relu(last)
            for i in range(r_fused, n):
                t = TpuConv(co, kernel_size=(1, 1, 3),
                            strides=(1, 1, 2), padding=(0, 0, 1),
                            use_bias=not self.use_bn,
                            kernel_init=conv_kernel_init,
                            bias_init=conv_bias_init_for_rank(3),
                            dtype=dt, name=f"conv{i}")(t)
                t = TorchBatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5,
                                   scale_init=bn_scale_init, dtype=dt,
                                   name=f"bn{i}")(t)
                if i < n - 1:
                    t = nn.relu(t)
                if dyn is not None:
                    zt = (zt + 1) // 2
                    t = dyn_mask5(t, zt)
            last = t

        res = TpuConv(co, kernel_size=(1, 1, 1),
                      strides=ds_strides, padding=(0, 0, 0),
                      use_bias=not self.use_bn,
                      kernel_init=conv_kernel_init,
                      bias_init=conv_bias_init_for_rank(3),
                      dtype=dt, name="ds_conv")(x_ds)
        res = TorchBatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5,
                             scale_init=bn_scale_init, dtype=dt,
                             name="ds_bn")(res)
        out = nn.relu(last + res)
        if dyn is not None:
            out = dyn_mask5(out, zt)
        return out


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
    packed_in: Optional[Tuple[int, int, int]] = None

    def _fused_bs(self, x, train: bool = False):
        # Round-2 measured the 4-deep zdimRed1 cascade LOSING fused
        # (27.8 vs 20.7 ms — slot-sparse full-width levels); with the
        # round-3 block-pair merges the ALL-fused projections win
        # outright (flagship step 190.2 vs 204.9 ms, same session) —
        # the classic path's banded patch volume (bf16[...,31,17,16],
        # 276 MB x4 in the step HLO) and its layout copies disappear.
        # Default: fused wherever eligible; MMF_FUSED_PROJ=0 forces off.
        # Under exact bucketing the EVAL path stays fused via the
        # extent-masked cascade (round 4).
        force = _os.environ.get("MMF_FUSED_PROJ", "")
        if force == "0":
            return None
        if current_valid() and stage_dyn_extents(train) is None:
            return None
        if int(_os.environ.get("MMF_FUSED_PROJ_CAP", "99")) <= 0:
            # cap=0 means "no fused levels" — the classic per-op path is
            # the same thing without _FusedReduction's empty-loop edge.
            return None
        if not _fused_active():
            return None
        if self.packed_in is None and x.ndim != 5:
            return None
        if not self.use_bn or self.dropout > 0.0 or self.features > 64:
            return None
        from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import (
            active_space_shards)
        X = (self.packed_in[0] if self.packed_in is not None
             else x.shape[2])
        if X % active_space_shards() != 0:
            return None
        z = (self.packed_in[1] * self.packed_in[2]
             if self.packed_in is not None else x.shape[3])
        # prefer bs*C = 128 (one MXU tile; band-dot FLOPs are linear in
        # bs), then an EVEN block count (enables the block-pair merges
        # that keep deeper cascade levels dense).
        preferred = max(2, min(8, 128 // max(1, self.features)))
        cands = [b for b in (8, 4, 2) if z % b == 0 and z > b]
        if not cands:
            return None
        return min(cands, key=lambda b: (b != preferred,
                                         (z // b) % 2, -b))

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.num_reductions
        if n > 0:
            bs = self._fused_bs(x, train)
            if bs is not None:
                dyn = (stage_dyn_extents(train)
                       if current_valid() else None)
                x = _FusedReduction(self.features, n=n, bs=bs,
                                    use_bn=self.use_bn,
                                    dtype=self.dtype,
                                    packed_in=self.packed_in,
                                    name="red")(x, train, dyn=dyn)
            else:
                if self.packed_in is not None:
                    from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv \
                        import unpack
                    x = unpack(x, *self.packed_in)
                x = ConvX(self.features,
                          kernels=((1, 1, 3),) * n,
                          strides=((1, 1, 2),) * n,
                          paddings=((0, 0, 1),) * n,
                          use_bn=self.use_bn, residual=True,
                          dropout=self.dropout,
                          downsample=True,
                          downsample_strides=(1, 1, 2 ** n),
                          dtype=self.dtype, name="red")(x, train)
        elif self.packed_in is not None:
            from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import \
                unpack
            x = unpack(x, *self.packed_in)
        fully = ConvX(self.features,
                      kernels=((1, 1, self.final_kernel),),
                      strides=((1, 1, 1),),
                      paddings=((0, 0, 0),),
                      use_bn=self.use_bn, residual=False,
                      dropout=self.dropout, downsample=False,
                      dtype=self.dtype, name="fully")
        ext = current_valid()
        if ext and "z" in ext:
            # exact bucketing: 'fully' sees the cascade's TRUE depth
            z_red = ext["z"]
            for _ in range(n):
                z_red = (z_red + 1) // 2
            with valid_extents(**{**ext, "z": z_red}):
                return fully(x, train)
        return fully(x, train)


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
    ``MaxPool3d``/``MaxPool2d`` with default stride=kernel).

    Measured (v5e, bf16 stage-1 shapes): a reshape-max rewrite is ~equal
    standalone but ~20 ms/step SLOWER in-graph (the 7D reshapes block
    fusion on the lane-padded compact layout), so this stays
    reduce_window; the real pool win is pooling in the PACKED layout
    (pool_packed in the fused encoder integration)."""
    window = tuple(window)
    return nn.max_pool(x, window_shape=window, strides=window,
                       padding="VALID")
