"""Y-chunked kernels for the (3,1,1) convs (PERF.md roadmap 2).

The chunked kernels read a (1, G, RX, CC) main block plus two
single-row halos per grid step — input traffic (1+2/G)x instead of the
per-row grid's 3x.  These tests run the REAL kernel bodies in interpret
mode at geometries with MULTIPLE chunks (Y > G), so the inter-chunk
halo reads and the true-edge halo zeroing are both exercised, and
compare against (a) the XLA reference and (b) the per-row kernels
(MMF_YCHUNK=0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc

B, X, nb, bs = 1, 3, 4, 8


@pytest.fixture(autouse=True)
def _interpret():
    fc.set_interpret_mode(True)
    yield
    fc.set_interpret_mode(False)


def _mk(Y, ci, co, dtype, n_in=1, seed=0):
    rng = np.random.default_rng(seed)
    xs, scales, biases = [], [], []
    for _ in range(n_in):
        x = jnp.asarray(rng.normal(size=(B, Y, X, nb * bs, ci)), dtype)
        xs.append(fc.pack(x, bs))
        scales.append(jnp.asarray(rng.normal(size=(bs * ci,)), dtype))
        biases.append(jnp.asarray(rng.normal(size=(bs * ci,)), dtype))
    w = jnp.asarray(rng.normal(size=(3, 1, 1, ci, co)) * 0.3, dtype)
    return xs, scales, biases, w


def _grads(xs, scales, biases, w, Y, relu=True, out_stats=False):
    def loss(xs, scales, biases, w):
        if out_stats:
            y, s1, s2 = fc.fused_conv(xs, scales, biases, w, X, nb, bs,
                                      relu=relu, impl="pallas",
                                      out_stats=True)
            l = (jnp.sum(y.astype(jnp.float32) ** 2)
                 + jnp.sum(s1 * 3.0) + jnp.sum(s2 * 0.5))
            return l, (y, s1, s2)
        y = fc.fused_conv(xs, scales, biases, w, X, nb, bs,
                          relu=relu, impl="pallas")
        return jnp.sum(y.astype(jnp.float32) ** 2), (y,)

    (l, aux), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                     has_aux=True)(xs, scales, biases, w)
    return aux, g


def _assert_tree_close(ga, gb, rtol, atol):
    fa, fb = jax.tree.leaves(ga), jax.tree.leaves(gb)
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=rtol, atol=atol)


def test_ychunk_G_selection(monkeypatch):
    monkeypatch.delenv("MMF_YCHUNK", raising=False)
    assert fc._ychunk_G(496) == 8
    assert fc._ychunk_G(124) == 4
    assert fc._ychunk_G(62) == 2
    assert fc._ychunk_G(31) == 0      # odd: per-row fallback
    monkeypatch.setenv("MMF_YCHUNK", "4")
    assert fc._ychunk_G(496) == 4
    monkeypatch.setenv("MMF_YCHUNK", "0")
    assert fc._ychunk_G(496) == 0


@pytest.mark.parametrize("Y,n_in,relu", [(16, 1, True), (12, 2, True),
                                         (16, 1, False)])
def test_ychunk_multi_chunk_parity(monkeypatch, Y, n_in, relu):
    """Chunked (nch >= 2: real inter-chunk halos) vs per-row kernels vs
    the XLA reference — fwd values and every cotangent."""
    xs, scales, biases, w = _mk(Y, 4, 4, jnp.float32, n_in=n_in,
                                seed=Y + n_in)
    monkeypatch.setenv("MMF_YCHUNK", "8")
    assert fc._ychunk_G(Y) >= 2 and Y // fc._ychunk_G(Y) >= 2
    aux_c, g_c = _grads(xs, scales, biases, w, Y, relu=relu)
    monkeypatch.setenv("MMF_YCHUNK", "0")
    aux_r, g_r = _grads(xs, scales, biases, w, Y, relu=relu)
    for a, b in zip(aux_c, aux_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    _assert_tree_close(g_c, g_r, rtol=1e-4, atol=1e-4)

    def loss_ref(xs, scales, biases, w):
        y = fc.fused_conv(xs, scales, biases, w, X, nb, bs, relu=relu,
                          impl="ref")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xs, scales,
                                                     biases, w)
    monkeypatch.setenv("MMF_YCHUNK", "8")

    def loss_c(xs, scales, biases, w):
        y = fc.fused_conv(xs, scales, biases, w, X, nb, bs, relu=relu,
                          impl="pallas")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_c2 = jax.grad(loss_c, argnums=(0, 1, 2, 3))(xs, scales, biases, w)
    _assert_tree_close(g_c2, g_ref, rtol=1e-4, atol=1e-4)


def test_ychunk_out_stats_parity(monkeypatch):
    """with_stats epilogue under chunking (training path: out_stats
    feeds the BN fold) vs the per-row ws kernels."""
    Y = 16
    xs, scales, biases, w = _mk(Y, 4, 4, jnp.float32, seed=7)
    monkeypatch.setenv("MMF_YCHUNK", "8")
    aux_c, g_c = _grads(xs, scales, biases, w, Y, out_stats=True)
    monkeypatch.setenv("MMF_YCHUNK", "0")
    aux_r, g_r = _grads(xs, scales, biases, w, Y, out_stats=True)
    for a, b in zip(aux_c, aux_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    _assert_tree_close(g_c, g_r, rtol=1e-4, atol=1e-4)


def test_ychunk_bf16(monkeypatch):
    Y = 16
    xs, scales, biases, w = _mk(Y, 4, 4, jnp.bfloat16, seed=9)
    monkeypatch.setenv("MMF_YCHUNK", "8")
    aux_c, g_c = _grads(xs, scales, biases, w, Y, out_stats=True)
    monkeypatch.setenv("MMF_YCHUNK", "0")
    aux_r, g_r = _grads(xs, scales, biases, w, Y, out_stats=True)
    for a, b in zip(aux_c, aux_r):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)
    _assert_tree_close(g_c, g_r, rtol=8e-2, atol=8e-2)


def test_ychunk_dyn_extents(monkeypatch):
    """Bucketed-eval extent masking under chunking: inputs carry
    garbage beyond the true (yt, xt, zt); parity vs the per-op
    oracle (masked activation + plain conv)."""
    Y = 16
    yt, xt, zt = 11, 2, 20
    rng = np.random.default_rng(42)
    ci = co = 4
    x = jnp.asarray(rng.normal(size=(B, Y, X, nb * bs, ci)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(bs * ci,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(bs * ci,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 1, 1, ci, co)) * 0.3,
                    jnp.float32)
    xp = fc.pack(x, bs)
    dyn = (jnp.int32(yt), jnp.int32(xt), jnp.int32(zt))

    monkeypatch.setenv("MMF_YCHUNK", "8")
    y_c = fc.fused_conv_dyn([xp], [s], [b], w, X, nb, bs, dyn,
                            relu=True, impl="pallas")
    monkeypatch.setenv("MMF_YCHUNK", "0")
    y_r = fc.fused_conv_dyn([xp], [s], [b], w, X, nb, bs, dyn,
                            relu=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)

    t = jnp.maximum(xp * s + b, 0.0)
    t = fc.mask_packed_dyn(t, X, nb, bs, dyn)
    y_orc = fc.fused_conv([t], [None], [None], w, X, nb, bs,
                          relu=False, impl="ref")
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_orc),
                               rtol=1e-5, atol=1e-5)


def test_ychunk_odd_Y_falls_back(monkeypatch):
    """Odd Y (stage 5's Y=31) must route through the per-row kernels
    and still be correct."""
    Y = 5
    xs, scales, biases, w = _mk(Y, 4, 4, jnp.float32, seed=13)
    monkeypatch.setenv("MMF_YCHUNK", "8")
    assert fc._ychunk_G(Y) == 0
    aux_p, g_p = _grads(xs, scales, biases, w, Y)

    def loss_ref(xs, scales, biases, w):
        y = fc.fused_conv(xs, scales, biases, w, X, nb, bs, impl="ref")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xs, scales,
                                                     biases, w)
    _assert_tree_close(g_p, g_ref, rtol=1e-4, atol=1e-4)
