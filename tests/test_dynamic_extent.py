"""Dynamic-extent op twins vs their static counterparts (groundwork for
EXACT shape bucketing, round-2 verdict #6): each op computes over TRUE
extents carried as dynamic scalars inside padded buffers and must be
bit-equal to the static op applied to the unpadded data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.ops.dynamic_extent import (
    adaptive_max_pool_dynamic, linear_resize_dynamic, mask_valid,
    masked_mean, upsample_nearest_indices_dynamic)
from multimodal_fusion_fpn_tpu.ops.interpolate import linear_resize
from multimodal_fusion_fpn_tpu.ops.pooling import adaptive_max_pool
from multimodal_fusion_fpn_tpu.ops.upsample import _ceil_indices


def _padded(x, pad_to):
    pads = [(0, p - s) for s, p in zip(x.shape, pad_to)]
    return jnp.asarray(np.pad(np.asarray(x), pads))


@pytest.mark.parametrize("n_true,m_true", [(37, 12), (24, 24), (16, 5),
                                           (40, 7)])
def test_adaptive_max_dynamic_matches_static(n_true, m_true):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, n_true, 3)).astype(np.float32)
    ref = adaptive_max_pool(jnp.asarray(x), (m_true,), axes=(1,))
    pad = 48
    xp = _padded(jnp.asarray(x), (2, pad, 3))
    out = jax.jit(lambda xp, n, m: adaptive_max_pool_dynamic(
        xp, (n,), (m,), axes=(1,), max_ratio=8))(
            xp, jnp.int32(n_true), jnp.int32(m_true))
    np.testing.assert_array_equal(np.asarray(out)[:, :m_true],
                                  np.asarray(ref))
    assert (np.asarray(out)[:, m_true:] == 0).all()


@pytest.mark.parametrize("n_true,m_true", [(37, 12), (16, 31), (9, 9)])
def test_linear_resize_dynamic_matches_static(n_true, m_true):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, n_true, 3)).astype(np.float32)
    ref = linear_resize(jnp.asarray(x), (m_true,), axes=(1,))
    pad = 40
    xp = _padded(jnp.asarray(x), (2, pad, 3))
    out = jax.jit(lambda xp, n, m: linear_resize_dynamic(
        xp, (n,), (m,), axes=(1,)))(
            xp, jnp.int32(n_true), jnp.int32(m_true))
    np.testing.assert_allclose(np.asarray(out)[:, :m_true],
                               np.asarray(ref), rtol=1e-6, atol=1e-6)
    assert (np.asarray(out)[:, m_true:] == 0).all()


# exact products only: the reference formula uses the SCALE, which
# equals n_out/n_in only when n_in*scale is integral (shipped nets use
# integer upfactors)
@pytest.mark.parametrize("n_in,scale", [(7, 2.0), (14, 1.5), (8, 2.5)])
def test_upsample_indices_dynamic_match_static(n_in, scale):
    n_out = int(n_in * scale)
    static = _ceil_indices(n_in, scale)
    dyn = upsample_nearest_indices_dynamic(jnp.int32(n_in),
                                           jnp.int32(n_out), n_out + 5)
    np.testing.assert_array_equal(np.asarray(dyn)[:n_out], static)
    assert (np.asarray(dyn)[n_out:] == 0).all()


def test_mask_valid_and_masked_mean():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 10, 4)).astype(np.float32)
    xm = mask_valid(jnp.asarray(x), {1: jnp.int32(6)})
    assert (np.asarray(xm)[:, 6:] == 0).all()
    np.testing.assert_array_equal(np.asarray(xm)[:, :6], x[:, :6])
    mm = masked_mean(xm, axis=1, n_true=jnp.int32(6))
    np.testing.assert_allclose(np.asarray(mm)[:, 0],
                               x[:, :6].mean(axis=1), rtol=1e-6)
