"""Shape-propagation and behavior tests for all 8 zoo architectures at a
small channel spec (compile-cached across runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.models.zoo import (build_model,
                                                  interpolate_from_crop,
                                                  model_factory)


def _init_apply(model, batch, train=False):
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.PRNGKey(0)}, b,
                             train=False))(batch)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables,
                                                               batch)
    return variables, out


def test_factory_has_all_eight():
    assert set(model_factory) == {
        "FPN", "FPNRegression", "FPNClassification", "FPNHybridFusion",
        "FPNHybridFusionRegression", "FPN2D", "FPNLateFusion",
        "FPNLateFusionRegression"}


def test_interpolate_from_crop():
    assert interpolate_from_crop("relative_2d") == "2d"
    assert interpolate_from_crop("relative_2d_max") == "2d_max"
    assert interpolate_from_crop("oct") is None
    assert interpolate_from_crop("none") is None


@pytest.mark.parametrize("name", ["FPN", "FPNRegression"])
def test_fpn_3d(tiny_spec, tiny_batch, name):
    cfg = make_config(model=name, crop="oct")
    model = build_model(cfg, spec=tiny_spec)
    _, out = _init_apply(model, tiny_batch)
    pred = out["prediction"]
    B, _, Y, Z, X = tiny_batch["image"].shape
    assert pred.shape == (B, 1, Y, 1, X)
    if name == "FPN":
        assert float(jnp.min(pred)) >= 0.0 and float(jnp.max(pred)) <= 1.0


def test_fpn_hybrid_fusion(tiny_spec, tiny_batch):
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, spec=tiny_spec)
    variables, out = _init_apply(model, tiny_batch)
    B, _, Y, Z, X = tiny_batch["image"].shape
    assert out["prediction"].shape == (B, 1, Y, 1, X)
    # Level5: both bottleneck encoders exist
    params = variables["params"]["resensnet"]
    assert "conv5_2d" in params and "conv5" in params
    assert "zdimRed5" in params


def test_fpn_hybrid_fusion_trilinear(tiny_spec, tiny_batch):
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d",
                      fusion_modality="slo")
    model = build_model(cfg, spec=tiny_spec)
    _, out = _init_apply(model, tiny_batch)
    B, _, Y, Z, X = tiny_batch["image"].shape
    assert out["prediction"].shape == (B, 1, Y, 1, X)


def test_fpn2d(tiny_spec, tiny_batch):
    cfg = make_config(model="FPN2D", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, spec=tiny_spec)
    _, out = _init_apply(model, tiny_batch)
    # output resized to mask shape when they differ
    assert out["prediction"].shape == tiny_batch["mask"].shape


def test_fpn_late_fusion(tiny_spec, tiny_batch):
    cfg = make_config(model="FPNLateFusion", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, spec=tiny_spec)
    variables, out = _init_apply(model, tiny_batch)
    B, _, Y, Z, X = tiny_batch["image"].shape
    assert out["prediction"].shape == (B, 1, Y, 1, X)
    params = variables["params"]
    assert "resensnet3d" in params and "resensnet2d" in params
    assert "fusion_module" in params
    # 3D branch must not have the final 1x1 (use_1x1=False)
    assert "final1" not in params["resensnet3d"]


def test_fpn_classification(tiny_spec, tiny_batch):
    cfg = make_config(model="FPNClassification", crop="oct",
                      number_of_outputs=3)
    model = build_model(cfg, spec=tiny_spec)
    variables, out = _init_apply(model, tiny_batch)
    assert out["prediction"].shape == (tiny_batch["image"].shape[0], 3)
    np.testing.assert_allclose(np.asarray(out["prediction"]).sum(-1), 1.0,
                               rtol=1e-5)
    # classification mode instantiates no decoder/projection params
    params = variables["params"]["resensnet"]
    assert "zdimRed1" not in params and "up_concat1" not in params


def test_batchnorm_stats_update(tiny_spec, tiny_batch):
    cfg = make_config(model="FPN", crop="oct")
    model = build_model(cfg, spec=tiny_spec)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.PRNGKey(0)}, b,
                             train=False))(tiny_batch)
    out, mutated = model.apply(variables, tiny_batch, train=True,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(before, after))
    assert changed


def test_projection_head_collapses_depth(tiny_spec):
    """zdimRed + mean produce depth-1 features for any valid Z."""
    from multimodal_fusion_fpn_tpu.models.blocks import ZDimReduction
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 4, 8, 64, 2)).astype(np.float32))
    mod = ZDimReduction(features=2, num_reductions=4, final_kernel=4)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    # 64 -> 32 -> 16 -> 8 -> 4 -> (valid 4) -> 1
    assert out.shape == (1, 4, 8, 1, 2)
