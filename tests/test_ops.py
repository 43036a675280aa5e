"""Parity tests for the exact-semantics device ops against torch (CPU)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from multimodal_fusion_fpn_tpu.ops.interpolate import linear_resize
from multimodal_fusion_fpn_tpu.ops.pooling import adaptive_max_pool
from multimodal_fusion_fpn_tpu.ops.upsample import upsample_nearest


def reference_ceil_upsample(x, scale):
    """Direct numpy transcription of the reference index formula
    (components.py:259-268)."""
    out = x
    for axis, f in zip((2, 3, 4), scale):
        n_out = int(out.shape[axis] * f)
        idx = (np.ceil(np.arange(1, 1 + n_out) / f) - 1).astype(int)
        out = np.take(out, idx, axis=axis)
    return out


@pytest.mark.parametrize("scale", [(2, 2, 1), (1, 2, 1), (2, 2, 2),
                                   (1.5, 2, 1)])
def test_upsample_nearest_matches_ceil_formula(scale):
    x = np.random.default_rng(0).normal(size=(2, 3, 4, 6, 5)).astype(
        np.float32)
    # device layout (B, Y, X, Z, C) vs reference (B, C, Y, X, Z)
    ref_in = np.transpose(x, (0, 4, 1, 2, 3))
    expected = reference_ceil_upsample(ref_in, scale)
    got = upsample_nearest(x, scale, axes=(1, 2, 3))
    got_ref_layout = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_array_equal(got_ref_layout, expected)


@pytest.mark.parametrize("in_shape,out_shape", [
    ((10, 12, 1), (4, 6, 1)),
    ((7, 9, 1), (3, 4, 1)),
    ((20, 16, 1), (20, 16, 1)),
    ((33, 5, 2), (8, 5, 1)),
])
def test_adaptive_max_pool_matches_torch(in_shape, out_shape):
    x = np.random.default_rng(1).normal(
        size=(2, 3) + in_shape).astype(np.float32)
    expected = F.adaptive_max_pool3d(torch.from_numpy(x),
                                     output_size=out_shape).numpy()
    # channels-last device layout
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    got = adaptive_max_pool(x_cl, out_shape, axes=(1, 2, 3))
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


@pytest.mark.parametrize("in_shape,out_shape", [
    ((5, 7, 1), (10, 14, 1)),
    ((10, 1, 12), (32, 1, 128)),
    ((9, 3, 4), (5, 6, 2)),
])
def test_linear_resize_matches_torch_trilinear(in_shape, out_shape):
    x = np.random.default_rng(2).normal(
        size=(2, 3) + in_shape).astype(np.float32)
    expected = F.interpolate(torch.from_numpy(x), size=out_shape,
                             mode="trilinear",
                             align_corners=False).numpy()
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    got = linear_resize(x_cl, out_shape, axes=(1, 2, 3))
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_max_pool_floor_semantics():
    """Odd sizes are floored like torch MaxPool3d."""
    from multimodal_fusion_fpn_tpu.models.blocks import max_pool
    x = np.random.default_rng(3).normal(size=(1, 5, 7, 9, 2)).astype(
        np.float32)
    got = max_pool(x, (1, 2, 2))
    expected = F.max_pool3d(
        torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))),
        kernel_size=(1, 2, 2)).numpy()
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 4, 1, 2, 3)), expected,
        rtol=1e-6)
