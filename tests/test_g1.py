"""Multi-row grid blocking for the kY==1 kernels (MMF_G1, round 4).

The kY==1 convs — 4 of the 5 stage convs ((1,3,3)s, reference
``models/fpn/components.py`` conv chains) plus every projection-cascade
conv — ran one Y row per grid step; with MMF_G1 the block carries G
consecutive Y rows processed as ONE (G*RX, CC) slab (fewer grid steps,
G*-larger DMAs and dots).  No halo is needed: kY==1 never mixes Y rows,
and the X-roll / z-wrap masks have period RX, so a roll crossing a
Y-row boundary lands only on rows whose tap is masked anyway.

These tests run the REAL kernel bodies in interpret mode with G >= 2
and compare against the per-row kernels (MMF_G1=0) and the XLA
reference — fwd values, stats epilogues, and every cotangent, incl.
the merged dx+dband backward, the gstats prologue fold, the strided
slot-sparse cascade form, and the dyn-extent (bucketed eval) masks.
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


def _mk(Y, ci, co, dtype, kshape=(1, 3, 3), n_in=1, seed=0):
    rng = np.random.default_rng(seed)
    xs, scales, biases = [], [], []
    for _ in range(n_in):
        x = jnp.asarray(rng.normal(size=(B, Y, X, nb * bs, ci)), dtype)
        xs.append(fc.pack(x, bs))
        scales.append(jnp.asarray(rng.normal(size=(bs * ci,)), dtype))
        biases.append(jnp.asarray(rng.normal(size=(bs * ci,)), dtype))
    w = jnp.asarray(rng.normal(size=kshape + (ci, co)) * 0.3, dtype)
    return xs, scales, biases, w


def _grads(xs, scales, biases, w, relu=True, out_stats=False,
           impl="pallas", strided=False, valid_in=0):
    def loss(xs, scales, biases, w):
        if strided:
            y = fc.fused_conv_strided(xs, scales, biases, w, X, nb, bs,
                                      valid_in, relu=relu, impl=impl)
            return jnp.sum(y.astype(jnp.float32) ** 2), (y,)
        if out_stats:
            y, s1, s2 = fc.fused_conv(xs, scales, biases, w, X, nb, bs,
                                      relu=relu, impl=impl,
                                      out_stats=True)
            l = (jnp.sum(y.astype(jnp.float32) ** 2)
                 + jnp.sum(s1 * 3.0) + jnp.sum(s2 * 0.5))
            return l, (y, s1, s2)
        y = fc.fused_conv(xs, scales, biases, w, X, nb, bs,
                          relu=relu, impl=impl)
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


def test_g1_selection(monkeypatch):
    monkeypatch.delenv("MMF_G1", raising=False)
    assert fc._g1_G(496, 64, 64) == 8
    assert fc._g1_G(124, 64, 64) == 4
    assert fc._g1_G(62, 64, 64) == 2
    assert fc._g1_G(31, 64, 64) == 1      # odd: per-row fallback
    monkeypatch.setenv("MMF_G1", "4")
    assert fc._g1_G(496, 64, 64) == 4
    monkeypatch.setenv("MMF_G1", "0")
    assert fc._g1_G(496, 64, 64) == 1


@pytest.mark.parametrize("kshape", [(1, 3, 3), (1, 1, 3), (1, 1, 1)])
@pytest.mark.parametrize("Y,n_in,relu", [(16, 1, True), (12, 2, True),
                                         (16, 1, False)])
def test_g1_parity(monkeypatch, kshape, Y, n_in, relu):
    """G-blocked vs per-row kernels vs the XLA reference — fwd values
    and every cotangent (merged dx+dband backward is the default)."""
    xs, scales, biases, w = _mk(Y, 4, 4, jnp.float32, kshape=kshape,
                                n_in=n_in, seed=Y + n_in)
    monkeypatch.setenv("MMF_G1", "8")
    assert fc._g1_G(Y, 64, 64) >= 2
    aux_g, g_g = _grads(xs, scales, biases, w, relu=relu)
    monkeypatch.setenv("MMF_G1", "0")
    aux_r, g_r = _grads(xs, scales, biases, w, relu=relu)
    for a, b in zip(aux_g, aux_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    _assert_tree_close(g_g, g_r, rtol=1e-4, atol=1e-4)

    _, g_ref = _grads(xs, scales, biases, w, relu=relu, impl="ref")
    monkeypatch.setenv("MMF_G1", "8")
    _, g_g2 = _grads(xs, scales, biases, w, relu=relu)
    _assert_tree_close(g_g2, g_ref, rtol=1e-4, atol=1e-4)


def test_g1_out_stats_parity(monkeypatch):
    """with_stats epilogue + the gstats prologue fold under G (the
    training path: out_stats feeds the BN fold)."""
    xs, scales, biases, w = _mk(16, 4, 4, jnp.float32, seed=7)
    monkeypatch.setenv("MMF_G1", "8")
    aux_g, g_g = _grads(xs, scales, biases, w, out_stats=True)
    monkeypatch.setenv("MMF_G1", "0")
    aux_r, g_r = _grads(xs, scales, biases, w, out_stats=True)
    for a, b in zip(aux_g, aux_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    _assert_tree_close(g_g, g_r, rtol=1e-4, atol=1e-4)


def test_g1_split_backward(monkeypatch):
    """MMF_MERGED_BWD=0: the split dx kernel takes the G path while
    dband stays per-row — both still correct."""
    xs, scales, biases, w = _mk(16, 4, 4, jnp.float32, seed=11)
    monkeypatch.setenv("MMF_G1", "8")
    monkeypatch.setenv("MMF_MERGED_BWD", "0")
    aux_g, g_g = _grads(xs, scales, biases, w, out_stats=True)
    monkeypatch.setenv("MMF_G1", "0")
    aux_r, g_r = _grads(xs, scales, biases, w, out_stats=True)
    for a, b in zip(aux_g, aux_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    _assert_tree_close(g_g, g_r, rtol=1e-4, atol=1e-4)


def test_g1_bf16(monkeypatch):
    xs, scales, biases, w = _mk(16, 4, 4, jnp.bfloat16, seed=9)
    monkeypatch.setenv("MMF_G1", "8")
    aux_g, g_g = _grads(xs, scales, biases, w, out_stats=True)
    monkeypatch.setenv("MMF_G1", "0")
    aux_r, g_r = _grads(xs, scales, biases, w, out_stats=True)
    for a, b in zip(aux_g, aux_r):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)
    _assert_tree_close(g_g, g_r, rtol=8e-2, atol=8e-2)


@pytest.mark.parametrize("valid_in", [2, 4])
def test_g1_strided(monkeypatch, valid_in):
    """The slot-sparse strided cascade form under G (kY==1 always)."""
    xs, scales, biases, w = _mk(16, 4, 4, jnp.float32,
                                kshape=(1, 1, 3), seed=21 + valid_in)
    monkeypatch.setenv("MMF_G1", "8")
    aux_g, g_g = _grads(xs, scales, biases, w, strided=True,
                        valid_in=valid_in)
    monkeypatch.setenv("MMF_G1", "0")
    aux_r, g_r = _grads(xs, scales, biases, w, strided=True,
                        valid_in=valid_in)
    for a, b in zip(aux_g, aux_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    _assert_tree_close(g_g, g_r, rtol=1e-4, atol=1e-4)


def test_g1_dyn_extents(monkeypatch):
    """Bucketed-eval extent masking under G: the scalar per-slab Y mask
    becomes a per-sub-row vector mask — parity vs the per-op oracle,
    with a true Y extent that cuts INSIDE a G block."""
    Y, yt, xt, zt = 16, 11, 2, 20
    rng = np.random.default_rng(42)
    ci = co = 4
    x = jnp.asarray(rng.normal(size=(B, Y, X, nb * bs, ci)),
                    jnp.float32)
    s = jnp.asarray(rng.normal(size=(bs * ci,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(bs * ci,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, ci, co)) * 0.3,
                    jnp.float32)
    xp = fc.pack(x, bs)
    dyn = (jnp.int32(yt), jnp.int32(xt), jnp.int32(zt))

    monkeypatch.setenv("MMF_G1", "8")
    assert fc._g1_G(Y, 64, 64) == 8 and yt % 8 != 0  # the cut is mid-block
    y_g = fc.fused_conv_dyn([xp], [s], [b], w, X, nb, bs, dyn,
                            relu=True, impl="pallas")
    monkeypatch.setenv("MMF_G1", "0")
    y_r = fc.fused_conv_dyn([xp], [s], [b], w, X, nb, bs, dyn,
                            relu=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)

    t = jnp.maximum(xp * s + b, 0.0)
    t = fc.mask_packed_dyn(t, X, nb, bs, dyn)
    y_orc = fc.fused_conv([t], [None], [None], w, X, nb, bs,
                          relu=False, impl="ref")
    np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_orc),
                               rtol=1e-5, atol=1e-5)


def test_g1_odd_Y_falls_back(monkeypatch):
    """Odd Y must route through the per-row kernels and stay correct."""
    xs, scales, biases, w = _mk(5, 4, 4, jnp.float32, seed=13)
    monkeypatch.setenv("MMF_G1", "8")
    assert fc._g1_G(5, 64, 64) == 1
    aux_p, g_p = _grads(xs, scales, biases, w)
    _, g_ref = _grads(xs, scales, biases, w, impl="ref")
    _assert_tree_close(g_p, g_ref, rtol=1e-4, atol=1e-4)


def test_slab_cap_limits_G_at_full_shapes(monkeypatch):
    """Round-5: at flagship stage-1 TRAIN shapes a G=8 slab is 16 MB —
    the multi-row kernels' working set blew past VMEM and the full-step
    bf16 compile was rejected (BENCH_r04 signature) while small-shape
    triage compiled.  The MMF_SLAB_MB budget must cap G there and leave
    small stages at G=8."""
    import os
    from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import (
        _g1_G, _ychunk_G)
    for k in ("MMF_G1", "MMF_YCHUNK", "MMF_SLAB_MB"):
        monkeypatch.delenv(k, raising=False)
    # stage-1 flagship: RX = 128*62 = 7936, CC = 128, bf16
    assert _g1_G(32, 7936, 128, 2) == 2
    assert _ychunk_G(32, 7936, 128, 2) == 2
    # small stage: unaffected
    assert _g1_G(32, 64, 64, 2) == 8
    assert _ychunk_G(32, 64, 64, 2) == 8
    # env budget override widens the cap
    os.environ["MMF_SLAB_MB"] = "64"
    try:
        assert _g1_G(32, 7936, 128, 2) == 8
    finally:
        del os.environ["MMF_SLAB_MB"]
    # ychunk without shape info keeps the legacy behavior
    assert _ychunk_G(32) == 8
