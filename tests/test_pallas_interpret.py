"""Execute the Pallas TPU kernels in CI via interpret mode.

The CPU suite's ``impl='auto'`` dispatch selects the XLA twin
(``fused_conv_ref``) off-TPU, so without these tests a Mosaic index-map
or mask regression would ship with a fully green suite (VERDICT r2 weak
#3, ADVICE r2 medium).  Here ``set_interpret_mode(True)`` routes
``impl='pallas'`` through the REAL kernel bodies (``_kernel``,
``_dx_kernel``, ``_dband_kernel``) interpreted on CPU, through the
production custom-VJP path, and compares forward values and every
cotangent against the XLA reference across the shipped
tap/stride/dtype matrix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc

B, Y, X, nb, bs = 1, 4, 6, 8, 8


@pytest.fixture(autouse=True)
def _interpret():
    fc.set_interpret_mode(True)
    yield
    fc.set_interpret_mode(False)


def _mk(ci, co, kshape, dtype, n_in=1, seed=0):
    rng = np.random.default_rng(seed)
    xs, scales, biases = [], [], []
    for i in range(n_in):
        x = jnp.asarray(rng.normal(size=(B, Y, X, nb * bs, ci)), dtype)
        xs.append(fc.pack(x, bs))
        scales.append(jnp.asarray(rng.normal(size=(bs * ci,)), dtype))
        biases.append(jnp.asarray(rng.normal(size=(bs * ci,)), dtype))
    w = jnp.asarray(rng.normal(size=kshape + (ci, co)) * 0.3, dtype)
    return xs, scales, biases, w


def _grads(impl, xs, scales, biases, w, relu=True, strided=False,
           valid_in=None):
    def loss(xs, scales, biases, w):
        if strided:
            y = fc.fused_conv_strided(xs, scales, biases, w, X, nb, bs,
                                      valid_in=valid_in, relu=relu,
                                      impl=impl)
        else:
            y = fc.fused_conv(xs, scales, biases, w, X, nb, bs,
                              relu=relu, impl=impl)
        return jnp.sum(y.astype(jnp.float32) ** 2), y

    (l, y), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                   has_aux=True)(xs, scales, biases, w)
    return y, g


def _assert_tree_close(ga, gb, rtol, atol):
    fa, fb = jax.tree.leaves(ga), jax.tree.leaves(gb)
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("kshape", [(1, 3, 3), (3, 1, 1), (1, 1, 1),
                                    (1, 3, 1)])
@pytest.mark.parametrize("n_in", [1, 2])
def test_fused_conv_kernel_parity(kshape, n_in):
    """fwd kernel + dx kernel + dband kernel vs the XLA reference,
    through the production custom VJP (fp32)."""
    xs, scales, biases, w = _mk(4, 4, kshape, jnp.float32, n_in=n_in,
                                seed=sum(kshape) + n_in)
    y_ref, g_ref = _grads("ref", xs, scales, biases, w)
    y_pal, g_pal = _grads("pallas", xs, scales, biases, w)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    _assert_tree_close(g_pal, g_ref, rtol=1e-4, atol=1e-4)


def test_fused_conv_kernel_parity_no_relu():
    xs, scales, biases, w = _mk(4, 4, (1, 3, 3), jnp.float32, seed=9)
    y_ref, g_ref = _grads("ref", xs, scales, biases, w, relu=False)
    y_pal, g_pal = _grads("pallas", xs, scales, biases, w, relu=False)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    _assert_tree_close(g_pal, g_ref, rtol=1e-4, atol=1e-4)


def test_fused_conv_kernel_parity_bf16():
    """The bf16 path exercises _roll_rows' fp32 round-trip and the
    fp32-upcast relu-mask comparison (the Mosaic 'unsupported
    comparison' fix)."""
    xs, scales, biases, w = _mk(4, 4, (1, 3, 3), jnp.bfloat16, seed=10)
    y_ref, g_ref = _grads("ref", xs, scales, biases, w)
    y_pal, g_pal = _grads("pallas", xs, scales, biases, w)
    np.testing.assert_allclose(np.asarray(y_pal, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=0.05, atol=0.1)
    _assert_tree_close(g_pal, g_ref, rtol=0.08, atol=0.3)


@pytest.mark.parametrize("valid_in,kz", [(8, 3), (4, 3), (2, 3), (8, 1)])
def test_fused_strided_kernel_parity(valid_in, kz):
    """The projection-cascade strided variant (slot-sparse blocks,
    wplus head roll at j_out=0) through the same kernels."""
    xs, scales, biases, w = _mk(4, 4, (1, 1, kz), jnp.float32,
                                seed=20 + valid_in + kz)
    y_ref, g_ref = _grads("ref", xs, scales, biases, w, strided=True,
                          valid_in=valid_in)
    y_pal, g_pal = _grads("pallas", xs, scales, biases, w, strided=True,
                          valid_in=valid_in)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    _assert_tree_close(g_pal, g_ref, rtol=1e-4, atol=1e-4)


def test_fused_conv_larger_geometry():
    """A second geometry: nb not a multiple of the sublane pad (nbp
    padding rows live), wider channels."""
    global nb
    rng = np.random.default_rng(3)
    nb_l, bs_l, ci, co, X_l = 5, 8, 8, 8, 4
    x = jnp.asarray(rng.normal(size=(B, Y, X_l, nb_l * bs_l, ci)),
                    jnp.float32)
    xp = fc.pack(x, bs_l)
    s = jnp.asarray(rng.normal(size=(bs_l * ci,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(bs_l * ci,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, ci, co)) * 0.3,
                    jnp.float32)

    def loss(xp, s, b, w, impl):
        y = fc.fused_conv([xp], [s], [b], w, X_l, nb_l, bs_l, impl=impl)
        return jnp.sum(y ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(xp, s, b, w, "ref")
    g_pal = jax.grad(loss, argnums=(0, 1, 2, 3))(xp, s, b, w, "pallas")
    _assert_tree_close(g_pal, g_ref, rtol=1e-4, atol=1e-4)


def test_banded_conv_blocked_pallas_interpret():
    """The (non-default) single-conv blocked Pallas kernel vs the XLA
    blocked impl (ADVICE r2 medium)."""
    from multimodal_fusion_fpn_tpu.ops import banded
    from multimodal_fusion_fpn_tpu.ops.pallas.banded_conv import (
        banded_conv_blocked_pallas, w2_band, w2_wrap)

    rng = np.random.default_rng(4)
    Bb, lead, Xb, bsb, ci, co = 1, 4, 6, 8, 4, 4
    for k_lead, kz in (((1, 3), 3), ((3, 1), 3), ((1, 1), 1)):
        w = jnp.asarray(
            rng.normal(size=k_lead + (kz, ci, co)) * 0.3, jnp.float32)
        x6 = jnp.asarray(
            rng.normal(size=(Bb, lead, Xb, 3, bsb, ci)), jnp.float32)
        taps = [w[t] for t in np.ndindex(*k_lead)]
        band = jnp.stack([w2_band(t, bsb) for t in taps])
        wrap = (jnp.stack([w2_wrap(t, bsb) for t in taps]) if kz == 3
                else jnp.zeros_like(band))
        y_pal = banded_conv_blocked_pallas(
            x6, band, wrap, k_lead, kz,
            preferred_element_type=jnp.float32, interpret=True)
        y_ref = banded._banded_conv_blocked_impl(x6, w, jnp.float32)
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# out_stats (BN-stats kernel epilogue + stats-cotangent prologue, round 4)
# ---------------------------------------------------------------------------

def _grads_ws(impl, xs, scales, biases, w, relu=True):
    """Scalar loss exercising y AND the stats outputs the way blocks.py
    does (mean/var fold into the next conv's affine)."""
    co = w.shape[-1]

    def loss(xs, scales, biases, w):
        y, s1, s2 = fc.fused_conv(xs, scales, biases, w, X, nb, bs,
                                  relu=relu, impl=impl, out_stats=True)
        n = y.size // co
        s1c = s1.reshape(bs, co).sum(0)
        s2c = s2.reshape(bs, co).sum(0)
        mean = s1c / n
        var = s2c / n - jnp.square(mean)
        l = (jnp.sum(y.astype(jnp.float32) ** 2)
             + jnp.sum(mean * 3.0) + jnp.sum(var * 0.5))
        return l, (y, s1, s2)

    (l, aux), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                     has_aux=True)(xs, scales, biases, w)
    return aux, g


def _grads_unfused_stats(impl, xs, scales, biases, w, relu=True):
    """The pre-round-4 composition: fused_conv + interior_stats-style
    XLA reduction — the parity oracle for the ws op."""
    co = w.shape[-1]

    def loss(xs, scales, biases, w):
        y = fc.fused_conv(xs, scales, biases, w, X, nb, bs,
                          relu=relu, impl=impl)
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=(0, 1, 2)).reshape(1, -1)
        s2 = jnp.sum(yf * yf, axis=(0, 1, 2)).reshape(1, -1)
        n = y.size // co
        s1c = s1.reshape(bs, co).sum(0)
        s2c = s2.reshape(bs, co).sum(0)
        mean = s1c / n
        var = s2c / n - jnp.square(mean)
        l = (jnp.sum(yf ** 2)
             + jnp.sum(mean * 3.0) + jnp.sum(var * 0.5))
        return l, (y, s1, s2)

    (l, aux), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                     has_aux=True)(xs, scales, biases, w)
    return aux, g


@pytest.mark.parametrize("kshape", [(1, 3, 3), (3, 1, 1), (1, 1, 1)])
@pytest.mark.parametrize("relu", [True, False])
def test_out_stats_parity_pallas(kshape, relu):
    """ws kernels (stats epilogue fwd; stats-cot prologue in dx/dband
    for kY==1, XLA pre-fold for kY==3) vs the unfused composition."""
    xs, scales, biases, w = _mk(4, 4, kshape, jnp.float32,
                                seed=11 + sum(kshape) + relu)
    aux_ref, g_ref = _grads_unfused_stats("pallas", xs, scales, biases,
                                          w, relu=relu)
    aux_ws, g_ws = _grads_ws("pallas", xs, scales, biases, w, relu=relu)
    for a, b in zip(aux_ws, aux_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    _assert_tree_close(g_ws, g_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kshape", [(1, 3, 3), (3, 1, 1)])
def test_out_stats_parity_ref_impl(kshape):
    """The XLA twin of the ws op (CPU 'auto' dispatch) must match the
    unfused composition too."""
    xs, scales, biases, w = _mk(4, 4, kshape, jnp.float32, seed=23)
    aux_ref, g_ref = _grads_unfused_stats("ref", xs, scales, biases, w)
    aux_ws, g_ws = _grads_ws("ref", xs, scales, biases, w)
    for a, b in zip(aux_ws, aux_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    # grads differ only by fp32 association order of
    # gy + gs1 + 2y*gs2 (pre-fold vs autodiff accumulation)
    _assert_tree_close(g_ws, g_ref, rtol=1e-5, atol=1e-5)


def test_out_stats_bf16_path():
    """bf16 end-to-end through the ws kernels (the dtype the flagship
    trains in) — values against the ref twin at bf16 tolerances."""
    xs, scales, biases, w = _mk(4, 4, (1, 3, 3), jnp.bfloat16, seed=31)
    aux_p, g_p = _grads_ws("pallas", xs, scales, biases, w)
    aux_r, g_r = _grads_ws("ref", xs, scales, biases, w)
    for a, b in zip(aux_p, aux_r):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)
    # bf16 rounding of two valid accumulation orders: a few ulp apart
    _assert_tree_close(g_p, g_r, rtol=8e-2, atol=8e-2)


# ---------------------------------------------------------------------------
# dynamic-extent (bucketed-eval) fused kernels (round 4)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kshape", [(1, 3, 3), (3, 1, 1), (1, 1, 1)])
def test_fused_conv_dyn_kernel_parity(kshape):
    """The extent-masked eval kernel vs (a) its XLA twin and (b) the
    per-op oracle: relu(affine(x)) masked to the true extents, then a
    plain conv.  Inputs carry GARBAGE beyond the extents (as the real
    inter-kernel buffers do) — the prologue must neutralize it."""
    ci, co = 4, 4
    yt, xt, zt = 3, 4, 40  # true extents inside (Y, X, nb*bs)=(4, 6, 64)
    rng = np.random.default_rng(77)
    x = jnp.asarray(rng.normal(size=(B, Y, X, nb * bs, ci)),
                    jnp.float32)
    s = jnp.asarray(rng.normal(size=(bs * ci,)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(bs * ci,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=kshape + (ci, co)) * 0.3,
                    jnp.float32)
    xp = fc.pack(x, bs)
    dyn = (jnp.int32(yt), jnp.int32(xt), jnp.int32(zt))

    y_pal = fc.fused_conv_dyn([xp], [s], [b], w, X, nb, bs, dyn,
                              relu=True, impl="pallas")
    y_ref = fc.fused_conv_dyn([xp], [s], [b], w, X, nb, bs, dyn,
                              relu=True, impl="ref")
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    # per-op oracle: masked activation, then the plain fused conv
    t = jnp.maximum(xp * s + b, 0.0)
    t = fc.mask_packed_dyn(t, X, nb, bs, dyn)
    y_orc = fc.fused_conv([t], [None], [None], w, X, nb, bs,
                          relu=False, impl="ref")
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_orc),
                               rtol=1e-5, atol=1e-5)


def test_mask_packed_dyn_matches_compact_mask():
    """mask_packed_dyn == compact-layout masking + pack."""
    rng = np.random.default_rng(5)
    ci = 4
    x = jnp.asarray(rng.normal(size=(B, Y, X, nb * bs, ci)), jnp.float32)
    yt, xt, zt = 3, 5, 50
    xp = fc.pack(x, bs)
    got = fc.mask_packed_dyn(xp, X, nb, bs, (yt, xt, zt))
    xm = np.asarray(x).copy()
    xm[:, yt:] = 0
    xm[:, :, xt:] = 0
    xm[:, :, :, zt:] = 0
    want = fc.pack(jnp.asarray(xm), bs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ---------------------------------------------------------------------------
# merged dx+dband backward (round 4): MMF_MERGED_BWD=1 vs 0
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kshape,n_in,strided", [
    ((1, 3, 3), 1, False), ((1, 3, 3), 2, False),
    ((3, 1, 1), 1, False), ((1, 1, 1), 1, False),
    ((1, 1, 3), 1, True),
])
def test_merged_bwd_matches_split(monkeypatch, kshape, n_in, strided):
    """The merged kernel (dx + ds + db + weight cotangents in one pass)
    must match the split dx/dband kernels on every cotangent."""
    import os
    xs, scales, biases, w = _mk(4, 4, kshape, jnp.float32,
                                n_in=n_in, seed=40 + sum(kshape))
    kw = dict(strided=strided, valid_in=8 if strided else None)
    monkeypatch.setitem(os.environ, "MMF_MERGED_BWD", "1")
    y_m, g_m = _grads("pallas", xs, scales, biases, w, **kw)
    monkeypatch.setitem(os.environ, "MMF_MERGED_BWD", "0")
    y_s, g_s = _grads("pallas", xs, scales, biases, w, **kw)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_s),
                               rtol=1e-6, atol=1e-6)
    _assert_tree_close(g_m, g_s, rtol=1e-5, atol=1e-5)


def test_merged_bwd_with_stats_fold(monkeypatch):
    """Merged backward under the out_stats cotangent fold (the
    production train config)."""
    import os
    xs, scales, biases, w = _mk(4, 4, (1, 3, 3), jnp.float32, seed=51)
    monkeypatch.setitem(os.environ, "MMF_MERGED_BWD", "1")
    aux_m, g_m = _grads_ws("pallas", xs, scales, biases, w)
    monkeypatch.setitem(os.environ, "MMF_MERGED_BWD", "0")
    aux_s, g_s = _grads_ws("pallas", xs, scales, biases, w)
    for a, b in zip(aux_m, aux_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    _assert_tree_close(g_m, g_s, rtol=1e-5, atol=1e-5)
