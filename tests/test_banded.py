"""Banded block-matmul conv vs lax.conv parity (all kernel configs the
model families use)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.ops.banded import banded_conv, conv_reference

CASES_3D = [
    # (kernel, strides, padding)  — encoder & projection configurations
    ((1, 3, 3), (1, 1, 1), (0, 1, 1)),
    ((3, 1, 1), (1, 1, 1), (1, 0, 0)),
    ((1, 1, 3), (1, 1, 2), (0, 0, 1)),
    ((1, 1, 4), (1, 1, 1), (0, 0, 0)),
    ((1, 1, 1), (1, 1, 1), (0, 0, 0)),
    ((1, 1, 1), (1, 1, 16), (0, 0, 0)),
    ((3, 3, 3), (1, 1, 1), (1, 1, 1)),
]

CASES_2D = [
    ((1, 3), (1, 1), (0, 1)),
    ((3, 1), (1, 1), (1, 0)),
    ((3, 3), (1, 1), (1, 1)),
    ((1, 1), (1, 1), (0, 0)),
]


@pytest.mark.parametrize("block", [2, 4, 8])
@pytest.mark.parametrize("kernel,strides,padding", CASES_3D)
@pytest.mark.parametrize("z", [64, 62, 31, 17])
def test_banded_conv3d_matches_lax(kernel, strides, padding, z, block):
    if kernel[-1] > z:
        pytest.skip("kernel larger than axis")
    rng = np.random.default_rng(0)
    ci, co = 3, 5
    x = jnp.asarray(rng.normal(size=(2, 4, 6, z, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=kernel + (ci, co)).astype(np.float32))
    expected = conv_reference(x, w, strides, padding)
    got = banded_conv(x, w, strides, padding, block=block)
    assert got.shape == expected.shape, (got.shape, expected.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("kernel,strides,padding", CASES_2D)
@pytest.mark.parametrize("wdim", [40, 33])
def test_banded_conv2d_matches_lax(kernel, strides, padding, wdim):
    rng = np.random.default_rng(1)
    ci, co = 4, 2
    x = jnp.asarray(rng.normal(size=(2, 9, wdim, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=kernel + (ci, co)).astype(np.float32))
    expected = conv_reference(x, w, strides, padding)
    got = banded_conv(x, w, strides, padding, block=8)
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_banded_conv_grad_matches_lax():
    import jax
    rng = np.random.default_rng(2)
    ci, co = 3, 4
    x = jnp.asarray(rng.normal(size=(1, 4, 5, 32, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 3, 3, ci, co)).astype(np.float32))

    def loss_banded(w, x):
        return jnp.sum(banded_conv(x, w, (1, 1, 1), (0, 1, 1)) ** 2)

    def loss_lax(w, x):
        return jnp.sum(conv_reference(x, w, (1, 1, 1), (0, 1, 1)) ** 2)

    gb = jax.grad(loss_banded)(w, x)
    gl = jax.grad(loss_lax)(w, x)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gl),
                               rtol=1e-3, atol=1e-3)
    gxb = jax.grad(loss_banded, argnums=1)(w, x)
    gxl = jax.grad(loss_lax, argnums=1)(w, x)
    np.testing.assert_allclose(np.asarray(gxb), np.asarray(gxl),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("kernel", [(1, 3, 3), (3, 1, 1), (1, 3),
                                    (3, 3, 3), (1, 1, 1)])
@pytest.mark.parametrize("bs", [8, 4, 2])
def test_blocked_custom_vjp_matches_autodiff(kernel, bs):
    """The hand-written VJP of banded_conv_blocked (flipped banded conv
    for dx, banded contraction + band collapse for dw) must agree with
    autodiff through the plain implementation."""
    import jax
    from multimodal_fusion_fpn_tpu.ops.banded import (
        _banded_conv_blocked_impl, banded_conv_blocked)

    rng = np.random.default_rng(3)
    ci, co = 3, 5
    nsp = len(kernel)
    lead = (4, 6)[:nsp - 1]
    nb = 5
    x6 = jnp.asarray(rng.normal(
        size=(2,) + lead + (nb, bs, ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=kernel + (ci, co)).astype(np.float32))
    cot = jnp.asarray(rng.normal(
        size=(2,) + lead + (nb, bs, co)).astype(np.float32))

    def loss_custom(x6, w):
        return jnp.vdot(banded_conv_blocked(x6, w), cot)

    def loss_plain(x6, w):
        return jnp.vdot(_banded_conv_blocked_impl(x6, w, jnp.float32), cot)

    np.testing.assert_allclose(loss_custom(x6, w), loss_plain(x6, w),
                               rtol=1e-4)
    gx_c, gw_c = jax.grad(loss_custom, argnums=(0, 1))(x6, w)
    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x6, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_p),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_p),
                               rtol=1e-3, atol=1e-3)
