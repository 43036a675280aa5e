"""Parity of the fused encoder-stage lowering (ops/pallas/fused_conv.py,
ConvX._fused_packed) against the per-op blocked path.

The fused path folds BatchNorm into the next conv's affine and runs each
conv as one fused kernel; its parameter/collection tree is REQUIRED to
be identical to the standard path so checkpoints interoperate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.models.blocks import (EncoderStage,
                                                     set_fused_stage_mode)


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    set_fused_stage_mode("auto")


def _stage_and_input(z=48, ci=3, co=8, downsample=True):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, z, ci)).astype(np.float32))
    stage = EncoderStage(co, downsample=downsample, ndim=3)
    return stage, x


def test_param_tree_identical():
    stage, x = _stage_and_input()
    set_fused_stage_mode("off")
    vs_std = stage.init(jax.random.PRNGKey(0), x)
    set_fused_stage_mode("on")
    vs_fused = stage.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(vs_std)
            == jax.tree_util.tree_structure(vs_fused))
    for a, b in zip(jax.tree.leaves(vs_std), jax.tree.leaves(vs_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("downsample", [True, False])
@pytest.mark.parametrize("z", [48, 36, 62])  # bs = 8, 4, 2
def test_forward_and_stats_parity(downsample, z):
    ci = 8 if not downsample else 3
    stage, x = _stage_and_input(z=z, ci=ci, downsample=downsample)
    set_fused_stage_mode("off")
    vs = stage.init(jax.random.PRNGKey(0), x)
    out_std, mut_std = stage.apply(vs, x, train=True,
                                   mutable=["batch_stats"])
    set_fused_stage_mode("on")
    out_f, mut_f = stage.apply(vs, x, train=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_std),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(mut_f), jax.tree.leaves(mut_std)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_grad_parity():
    stage, x = _stage_and_input()
    set_fused_stage_mode("off")
    vs = stage.init(jax.random.PRNGKey(0), x)

    def loss(params, mode):
        set_fused_stage_mode(mode)
        out, _ = stage.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.sum(out * jnp.cos(out))

    g_std = jax.grad(lambda p: loss(p, "off"))(vs["params"])
    g_fused = jax.grad(lambda p: loss(p, "on"))(vs["params"])
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_std)):
        scale = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=2e-4)


def test_eval_mode_parity():
    stage, x = _stage_and_input()
    set_fused_stage_mode("off")
    vs = stage.init(jax.random.PRNGKey(0), x)
    out_std = stage.apply(vs, x, train=False)
    set_fused_stage_mode("on")
    out_f = stage.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_std),
                               rtol=1e-4, atol=1e-5)


def test_full_model_forward_parity():
    """FPNHybridFusion forward agrees between lowerings at tiny widths."""
    from multimodal_fusion_fpn_tpu.config import make_config
    from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec
    from multimodal_fusion_fpn_tpu.models.zoo import build_model

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(1, 1, 8, 64, 32)).astype(np.float32),
        "slo": rng.normal(size=(1, 1, 80, 1, 32)).astype(np.float32),
    }
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, spec=ArchSpec(channels=(2, 4, 8, 16, 32)),
                        remat=False)
    set_fused_stage_mode("off")
    vs = model.init(jax.random.PRNGKey(0), batch)
    out_std = model.apply(vs, batch)["prediction"]
    set_fused_stage_mode("on")
    vs2 = model.init(jax.random.PRNGKey(0), batch)
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(vs2))
    out_f = model.apply(vs, batch)["prediction"]
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_std),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("z,num_reductions", [(48, 2), (48, 4), (62, 1)])
def test_projection_cascade_parity(z, num_reductions, monkeypatch):
    """_FusedReduction (strided fused cascade, opt-in via
    MMF_FUSED_PROJ) vs the per-op ConvX path: identical param tree,
    matching forward/stats/grads."""
    import os
    from multimodal_fusion_fpn_tpu.models.blocks import ZDimReduction
    monkeypatch.setitem(os.environ, "MMF_FUSED_PROJ", "1")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 6, z, 8)).astype(np.float32))
    proj = ZDimReduction(8, num_reductions=num_reductions)

    set_fused_stage_mode("off")
    vs = proj.init(jax.random.PRNGKey(0), x)
    out_std, mut_std = proj.apply(vs, x, train=True,
                                  mutable=["batch_stats"])
    set_fused_stage_mode("on")
    vs2 = proj.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(vs2))
    for a, b in zip(jax.tree.leaves(vs), jax.tree.leaves(vs2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_f, mut_f = proj.apply(vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_std),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(mut_f), jax.tree.leaves(mut_std)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    def loss(params, mode):
        set_fused_stage_mode(mode)
        out, _ = proj.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.sum(out * jnp.cos(out))

    g_std = jax.grad(lambda p: loss(p, "off"))(vs["params"])
    g_f = jax.grad(lambda p: loss(p, "on"))(vs["params"])
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_std)):
        scale = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=2e-4)


def test_grad_parity_under_remat():
    """jax.checkpoint around the fused stage replays the ws custom-VJP
    forward during the backward (the bench's B=8 remat config depends
    on this): gradients must match the un-rematted fused run exactly."""
    from multimodal_fusion_fpn_tpu.models.blocks import maybe_remat
    _, x = _stage_and_input()
    set_fused_stage_mode("on")
    StageR = maybe_remat(EncoderStage, True)
    stage_r = StageR(8, downsample=True, ndim=3)
    stage = EncoderStage(8, downsample=True, ndim=3)
    vs = stage.init(jax.random.PRNGKey(0), x)

    def loss(mod, params):
        # train passed POSITIONALLY: nn.remat static_argnums counts
        # positional args only (the production call sites do the same)
        out, _ = mod.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, x,
            True, mutable=["batch_stats"])
        return jnp.sum(out * jnp.cos(out))

    g_plain = jax.grad(lambda p: loss(stage, p))(vs["params"])
    g_remat = jax.grad(lambda p: loss(stage_r, p))(vs["params"])
    for a, b in zip(jax.tree.leaves(g_remat), jax.tree.leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    set_fused_stage_mode("auto")


def test_eval_conv_pair_parity(monkeypatch):
    """MMF_FUSED_PAIR=1 (eval 2-conv mega-kernel): stage eval output
    must match the unpaired fused path exactly (the mid affine comes
    from the same running stats; the intermediate just never touches
    HBM)."""
    import os
    stage, x = _stage_and_input()
    set_fused_stage_mode("on")
    vs = stage.init(jax.random.PRNGKey(0), x)
    out_ref = stage.apply(vs, x, train=False)
    monkeypatch.setitem(os.environ, "MMF_FUSED_PAIR", "1")
    out_pair = stage.apply(vs, x, train=False)
    set_fused_stage_mode("auto")
    np.testing.assert_allclose(np.asarray(out_pair), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_eval_conv_pair_kernel_interpret(monkeypatch):
    """The _kernel2 body itself (interpret mode) vs its XLA twin and vs
    two single fused convs, incl. under dynamic extents."""
    import os
    from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc

    rng = np.random.default_rng(13)
    B_, Y_, X_, nb_, bs_ = 1, 4, 6, 8, 8
    ci, cm, co = 4, 4, 4
    x = jnp.asarray(rng.normal(size=(B_, Y_, X_, nb_ * bs_, ci)),
                    jnp.float32)
    xp = fc.pack(x, bs_)
    s0 = jnp.asarray(rng.normal(size=(bs_ * ci,)), jnp.float32)
    b0 = jnp.asarray(rng.normal(size=(bs_ * ci,)), jnp.float32)
    sm = jnp.asarray(rng.normal(size=(bs_ * cm,)), jnp.float32)
    bm = jnp.asarray(rng.normal(size=(bs_ * cm,)), jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(1, 3, 3, ci, cm)) * 0.3,
                     jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(1, 3, 3, cm, co)) * 0.3,
                     jnp.float32)

    for dyn in (None, (jnp.int32(3), jnp.int32(4), jnp.int32(40))):
        fc.set_interpret_mode(True)
        try:
            got = fc.fused_conv2_eval(xp, s0, b0, w0, sm, bm, w1, X_,
                                      nb_, bs_, relu0=True,
                                      impl="pallas", dyn_extents=dyn)
        finally:
            fc.set_interpret_mode(False)
        ref = fc.fused_conv2_eval(xp, s0, b0, w0, sm, bm, w1, X_, nb_,
                                  bs_, relu0=True, impl="ref",
                                  dyn_extents=dyn)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        if dyn is None:
            y1 = fc.fused_conv([xp], [s0], [b0], w0, X_, nb_, bs_,
                               relu=True, impl="ref")
            y2 = fc.fused_conv([y1], [sm], [bm], w1, X_, nb_, bs_,
                               relu=True, impl="ref")
            np.testing.assert_allclose(np.asarray(got), np.asarray(y2),
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ci,downsample", [(3, True), (8, True),
                                           (8, False)])
def test_eval_chain_parity(monkeypatch, ci, downsample):
    """MMF_FUSED_CHAIN=1 (eval whole-block chain kernel): stage eval
    output must match the per-conv fused path exactly — narrow entry
    (ci=3), res_conv (downsample) and res_id variants, block1's
    trailing (3,1,1) conv included."""
    import os
    stage, x = _stage_and_input(ci=ci, downsample=downsample)
    set_fused_stage_mode("on")
    vs = stage.init(jax.random.PRNGKey(0), x)
    out_ref = stage.apply(vs, x, train=False)
    monkeypatch.setitem(os.environ, "MMF_FUSED_CHAIN", "1")
    out_chain = stage.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(out_chain),
                               np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_eval_chain_kernel_interpret(monkeypatch):
    """The _chain_kernel body (interpret mode) at stage level: the
    whole EncoderStage eval forward through the REAL kernels vs the
    per-conv XLA path, multi-chunk Y included."""
    import os
    from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 4, 48, 8)).astype(np.float32))
    stage = EncoderStage(8, downsample=True, ndim=3)
    set_fused_stage_mode("on")
    vs = stage.init(jax.random.PRNGKey(0), x)
    out_ref = stage.apply(vs, x, train=False)
    monkeypatch.setitem(os.environ, "MMF_FUSED_CHAIN", "1")
    fc.set_interpret_mode(True)
    try:
        out_chain = stage.apply(vs, x, train=False)
    finally:
        fc.set_interpret_mode(False)
    np.testing.assert_allclose(np.asarray(out_chain),
                               np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_eval_chain_kernel_dyn_interpret(monkeypatch):
    """fused_chain_eval under dynamic extents (interpret kernels) vs
    its XLA twin and vs the per-conv dyn composition, with garbage
    beyond the true extents."""
    from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc

    rng = np.random.default_rng(11)
    B_, Y_, X_, nb_, bs_ = 1, 8, 3, 4, 8
    ci = co = 4
    x = jnp.asarray(rng.normal(size=(B_, Y_, X_, nb_ * bs_, ci)),
                    jnp.float32)
    xp = fc.pack(x, bs_)
    dyn = (jnp.int32(6), jnp.int32(2), jnp.int32(20))

    def mk(shape, scale=0.3, seed=0):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.normal(size=shape) * scale, jnp.float32)

    convs = [(mk((1, 3, 3, ci, co), seed=1),
              mk((bs_ * co,), 1.0, 2), mk((bs_ * co,), 1.0, 3)),
             (mk((1, 3, 3, co, co), seed=4),
              mk((bs_ * co,), 1.0, 5), mk((bs_ * co,), 1.0, 6)),
             (mk((3, 1, 1, co, co), seed=7),
              mk((bs_ * co,), 1.0, 8), mk((bs_ * co,), 1.0, 9))]
    ds = (mk((1, 1, 1, ci, co), seed=10),
          mk((bs_ * co,), 1.0, 11), mk((bs_ * co,), 1.0, 12))

    for final, ds_p in (("res_conv", ds), ("res_id", None),
                        ("relu", None), ("affine", None)):
        for d in (None, dyn):
            ref = fc.fused_chain_eval(xp, None, None, False, convs,
                                      final, ds_p, X_, nb_, bs_,
                                      impl="ref", dyn_extents=d)
            fc.set_interpret_mode(True)
            try:
                got = fc.fused_chain_eval(xp, None, None, False, convs,
                                          final, ds_p, X_, nb_, bs_,
                                          impl="pallas", dyn_extents=d)
            finally:
                fc.set_interpret_mode(False)
            if d is not None:
                got = fc.mask_packed_dyn(got, X_, nb_, bs_, d)
                ref = fc.mask_packed_dyn(ref, X_, nb_, bs_, d)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"{final} dyn={d is not None}")

    # per-conv oracle (no dyn): three fused convs + res_conv epilogue
    y = fc.fused_conv([xp], [None], [None], convs[0][0], X_, nb_, bs_,
                      relu=False, impl="ref")
    y = fc.fused_conv([y], [convs[0][1]], [convs[0][2]], convs[1][0],
                      X_, nb_, bs_, relu=True, impl="ref")
    y = fc.fused_conv([y], [convs[1][1]], [convs[1][2]], convs[2][0],
                      X_, nb_, bs_, relu=True, impl="ref")
    out = y * convs[2][1] + convs[2][2]
    yd = fc.fused_conv([xp], [None], [None], ds[0], X_, nb_, bs_,
                       relu=False, impl="ref")
    out = jnp.maximum(out + yd * ds[1] + ds[2], 0.0)
    got = fc.fused_chain_eval(xp, None, None, False, convs, "res_conv",
                              ds, X_, nb_, bs_, impl="ref")
    np.testing.assert_allclose(np.asarray(got), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# 2D (en-face) stages on the singleton-X mapping: a 2D stage rides the
# SAME 3D kernels with X=1, z=W, kernels (kh, kw) -> (kh, 1, kw), while
# the PARAM tree keeps 2D shapes (checkpoint/torch-import parity).
# Reference 2D stage: fusion3D2D.py:261-293.
# ---------------------------------------------------------------------------

def _stage2d_and_input(w=48, ci=1, co=16, h=12, downsample=True):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, h, w, ci)).astype(np.float32))
    stage = EncoderStage(co, downsample=downsample, ndim=2)
    return stage, x


def test_param_tree_identical_2d():
    stage, x = _stage2d_and_input()
    set_fused_stage_mode("off")
    vs_std = stage.init(jax.random.PRNGKey(0), x)
    set_fused_stage_mode("on")
    vs_fused = stage.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(vs_std)
            == jax.tree_util.tree_structure(vs_fused))
    for a, b in zip(jax.tree.leaves(vs_std), jax.tree.leaves(vs_fused)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("ci,downsample", [(1, True), (16, False),
                                           (3, True)])
@pytest.mark.parametrize("w", [48, 36, 62])  # bs = 8, 4, 2
def test_forward_and_stats_parity_2d(ci, downsample, w):
    stage, x = _stage2d_and_input(w=w, ci=ci, downsample=downsample)
    set_fused_stage_mode("off")
    vs = stage.init(jax.random.PRNGKey(0), x)
    out_std, mut_std = stage.apply(vs, x, train=True,
                                   mutable=["batch_stats"])
    set_fused_stage_mode("on")
    out_f, mut_f = stage.apply(vs, x, train=True,
                               mutable=["batch_stats"])
    assert out_f.shape == out_std.shape
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_std),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(mut_f), jax.tree.leaves(mut_std)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_eval_parity_2d():
    stage, x = _stage2d_and_input(ci=1, downsample=True)
    set_fused_stage_mode("off")
    vs = stage.init(jax.random.PRNGKey(0), x)
    # push the running stats off their init values first
    _, mut = stage.apply(vs, x, train=True, mutable=["batch_stats"])
    vs = {"params": vs["params"], **mut}
    out_std = stage.apply(vs, x, train=False)
    set_fused_stage_mode("on")
    out_f = stage.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_std),
                               rtol=1e-4, atol=1e-4)


def test_grad_parity_2d():
    stage, x = _stage2d_and_input(ci=1, downsample=True)
    set_fused_stage_mode("off")
    vs = stage.init(jax.random.PRNGKey(0), x)

    def loss(params, mode):
        set_fused_stage_mode(mode)
        out, _ = stage.apply(
            {"params": params, "batch_stats": vs["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.sum(out * jnp.cos(out))

    g_std = jax.grad(lambda p: loss(p, "off"))(vs["params"])
    g_fused = jax.grad(lambda p: loss(p, "on"))(vs["params"])
    flat_s = jax.tree_util.tree_flatten_with_path(g_std)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_fused)[0]
    for (path, b), (_, a) in zip(flat_s, flat_f):
        # ci=1: the 1x1 ds conv feeding BN is near scale-invariant in
        # its weight, so that leaf's gradient is heavy cancellation —
        # fp32 stats noise amplifies ~1000x there (verified: with f64
        # stats reductions both paths agree to 5e-8; same effect exists
        # on the 3D ci=1 narrow path).  Everything else holds 2e-4.
        tol = 5e-3 if "ds_conv" in jax.tree_util.keystr(path) else 2e-4
        scale = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=tol,
                                   err_msg=jax.tree_util.keystr(path))


def test_fpn2d_model_parity_2d_plumbing():
    """FPN2D end-to-end between lowerings: the whole encoder rides the
    2D packed plumbing (run_2d_encoder — fused singleton-X stages +
    packed (wY,1,wZ) inter-stage pools) when fused; identical param
    tree, matching train forward + batch stats and eval forward."""
    from multimodal_fusion_fpn_tpu.config import make_config
    from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec
    from multimodal_fusion_fpn_tpu.models.zoo import build_model

    rng = np.random.default_rng(5)
    batch = {
        "image": rng.normal(size=(1, 1, 8, 64, 32)).astype(np.float32),
        "bscan_size": np.array([[8, 32]], np.int32),
        "slo": rng.normal(size=(1, 1, 80, 1, 32)).astype(np.float32),
        "mask": np.ones((1, 1, 80, 1, 32), np.float32),
    }
    cfg = make_config(model="FPN2D", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, spec=ArchSpec(channels=(4, 8, 16, 32, 64)),
                        remat=False)
    set_fused_stage_mode("off")
    vs = model.init(jax.random.PRNGKey(0), batch)
    out_std, mut_std = model.apply(vs, batch, train=True,
                                   mutable=["batch_stats"])
    ev_std = model.apply(vs, batch)["prediction"]
    set_fused_stage_mode("on")
    vs2 = model.init(jax.random.PRNGKey(0), batch)
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(vs2))
    out_f, mut_f = model.apply(vs, batch, train=True,
                               mutable=["batch_stats"])
    ev_f = model.apply(vs, batch)["prediction"]
    np.testing.assert_allclose(np.asarray(out_f["prediction"]),
                               np.asarray(out_std["prediction"]),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(mut_f), jax.tree.leaves(mut_std)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ev_f), np.asarray(ev_std),
                               rtol=1e-4, atol=1e-5)
