"""pool_packed (packed-layout Pallas max pool) vs nn.max_pool: forward
and gradient parity across windows/block sizes, interpret mode on CPU
(the kernels' on-chip twin is exercised by the fused-stage and
full-model tests plus the on-chip tools)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import pack, unpack
from multimodal_fusion_fpn_tpu.ops.pallas.pool import (pool_packed,
                                                       retarget_bs)


@pytest.mark.parametrize("B,Y,X,Z,C,bs,win", [
    (2, 4, 6, 32, 3, 8, (1, 2, 2)),
    (2, 4, 6, 32, 3, 8, (2, 2, 2)),
    (1, 2, 4, 16, 5, 4, (1, 2, 2)),
    (2, 2, 4, 16, 2, 2, (2, 2, 2)),
    (1, 4, 6, 31, 16, 1, (2, 2, 1)),  # bs=1, no z pooling
])
def test_pool_packed_matches_max_pool(B, Y, X, Z, C, bs, win):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, Y, X, Z, C)).astype(np.float32))
    xp = pack(x, bs)
    nb = Z // bs
    wY, wX, wZ = win
    out = pool_packed(xp, X, nb, bs, win)
    ref = nn.max_pool(x, window_shape=win, strides=win, padding="VALID")
    got = out.reshape(B, Y // wY, X // wX, nb * (bs // wZ), C)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    g1 = jax.grad(lambda xp: jnp.sum(
        pool_packed(xp, X, nb, bs, win) ** 2))(xp)
    g2 = jax.grad(lambda x: jnp.sum(
        nn.max_pool(x, win, win, "VALID") ** 2))(x)
    np.testing.assert_allclose(np.asarray(unpack(g1, X, nb, bs)),
                               np.asarray(g2), rtol=1e-6)


def test_retarget_bs_is_a_permutation_free_reshape():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 24, 3)).astype(np.float32))
    xp = pack(x, 8)
    xr, nb2 = retarget_bs(xp, 4, 3, 8, 4)
    assert nb2 == 6
    np.testing.assert_array_equal(np.asarray(unpack(xr, 4, 6, 4)),
                                  np.asarray(x))


@pytest.mark.parametrize("win", [(1, 2, 2), (2, 2, 2), (2, 2, 1)])
def test_pool_row_mode_matches_per_window(monkeypatch, win):
    """MMF_POOL_ROW (whole-X-row blocks, default on) vs the per-window
    grid: bit-identical forward and cotangent."""
    rng = np.random.default_rng(3)
    B, Y, X, Z, C, bs = 2, 4, 6, 32, 3, 8
    x = jnp.asarray(rng.normal(size=(B, Y, X, Z, C)).astype(np.float32))
    xp = pack(x, bs)
    nb = Z // bs

    def run():
        out = pool_packed(xp, X, nb, bs, win)
        g = jax.grad(lambda xp: jnp.sum(
            pool_packed(xp, X, nb, bs, win) ** 2))(xp)
        return np.asarray(out), np.asarray(g)

    monkeypatch.setenv("MMF_POOL_ROW", "1")
    o_row, g_row = run()
    monkeypatch.setenv("MMF_POOL_ROW", "0")
    o_win, g_win = run()
    np.testing.assert_array_equal(o_row, o_win)
    np.testing.assert_array_equal(g_row, g_win)


@pytest.mark.parametrize("win", [(1, 2, 2), (2, 2, 2)])
@pytest.mark.parametrize("K", [2, 4])
def test_pool_rowk_matches_per_window(monkeypatch, win, K):
    """MMF_POOL_ROWK (K-window chunked rows, round-5 opt-in middle
    ground after the full-row kernels were Mosaic-rejected at flagship
    shapes) vs the per-window grid: bit-identical fwd + cotangent."""
    rng = np.random.default_rng(5)
    B, Y, X, Z, C, bs = 2, 4, 16, 32, 3, 8
    x = jnp.asarray(rng.normal(size=(B, Y, X, Z, C)).astype(np.float32))
    xp = pack(x, bs)
    nb = Z // bs

    def run():
        out = pool_packed(xp, X, nb, bs, win)
        g = jax.grad(lambda xp: jnp.sum(
            pool_packed(xp, X, nb, bs, win) ** 2))(xp)
        return np.asarray(out), np.asarray(g)

    monkeypatch.setenv("MMF_POOL_ROWK", str(K))
    monkeypatch.delenv("MMF_POOL_ROW", raising=False)
    o_k, g_k = run()
    monkeypatch.setenv("MMF_POOL_ROWK", "0")
    o_win, g_win = run()
    np.testing.assert_array_equal(o_k, o_win)
    np.testing.assert_array_equal(g_k, g_win)
