"""EXACT shape bucketing (round-2 verdict #6): evaluating a model on a
ZERO-PADDED input with the true extents passed as dynamic scalars
("__valid_image__"/"__valid_enface__") must reproduce the unpadded
run's prediction on the valid region — conv-boundary zeros, pool
extents, projection depth means and the 2D->3D alignment all computed
over the TRUE extents inside the padded buffers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.config import make_config
from multimodal_fusion_fpn_tpu.models.zoo import build_model


def _pad_to(a, dims):
    pads = [(0, 0)] * a.ndim
    for d, tgt in dims.items():
        pads[d] = (0, tgt - a.shape[d])
    return np.pad(np.asarray(a), pads)


@pytest.mark.parametrize("name,crop", [
    ("FPN", "oct"),
    ("FPNHybridFusion", "relative_2d_max"),
    ("FPN2D", "relative_2d_max"),
    ("FPNLateFusion", "relative_2d_max"),
    ("FPNLateFusion", "relative_2d"),
])
def test_exact_bucketing_matches_unpadded(name, crop, tiny_spec):
    rng = np.random.default_rng(5)
    y, z, x = 8, 64, 32
    eh, ew = 80, 32
    batch = {
        "image": rng.normal(size=(1, 1, y, z, x)).astype(np.float32),
        # FPN2D resizes its output to the mask resolution
        # (fusion_nets.py:143-146): give the batch a mask so that path
        # is exercised under bucketing too.
        "mask": (rng.random((1, 1, y, 1, x)) > 0.5).astype(np.float32),
    }
    if name != "FPN":
        batch["slo"] = rng.normal(size=(1, 1, eh, 1, ew)).astype(
            np.float32)
        cfg = make_config(model=name, crop=crop, fusion_modality="slo")
    else:
        cfg = make_config(model=name, crop=crop)
    model = build_model(cfg, spec=tiny_spec, remat=False)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch,
                    train=False)
    ref = np.asarray(model.apply(vs, batch, train=False)["prediction"])

    padded = dict(batch)
    if name != "FPN2D":  # FPN2D consumes only the en-face modality
        padded["image"] = _pad_to(batch["image"], {2: 16, 3: 96, 4: 48})
        padded["__valid_image__"] = jnp.asarray([y, z, x], jnp.int32)
    if "slo" in batch:
        padded["slo"] = _pad_to(batch["slo"], {2: 96, 4: 48})
        padded["__valid_enface__"] = jnp.asarray([eh, ew], jnp.int32)

    out = np.asarray(model.apply(vs, padded, train=False)["prediction"])
    got = out[:, :, :ref.shape[2], :, :ref.shape[4]]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_fpn2d_bucketing_maskless_batch(tiny_spec):
    """Mask-less eval batches (the harness supports them) must not
    crash FPN2D under bucketing: the model skips its mask-resolution
    resize — as the unbucketed path always did — and returns the
    padded prediction, exact on the valid region (the harness crops)."""
    rng = np.random.default_rng(7)
    eh, ew = 80, 32
    batch = {"slo": rng.normal(size=(1, 1, eh, 1, ew)).astype(np.float32)}
    cfg = make_config(model="FPN2D", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, spec=tiny_spec, remat=False)
    vs = model.init({"params": jax.random.PRNGKey(0)}, batch,
                    train=False)
    ref = np.asarray(model.apply(vs, batch, train=False)["prediction"])

    padded = dict(batch)
    padded["slo"] = _pad_to(batch["slo"], {2: 96, 4: 48})
    padded["__valid_enface__"] = jnp.asarray([eh, ew], jnp.int32)
    out = np.asarray(model.apply(vs, padded, train=False)["prediction"])
    got = out[:, :, :ref.shape[2], :, :ref.shape[4]]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_harness_bucketing_exact_end_to_end(tmp_path, tiny_spec):
    """Through the REAL eval harness: run_evaluation_instance with
    shape_bucket=64 (inputs padded by the harness's own _bucket_pad
    heuristic, true extents attached) must reproduce the bucket=0 run's
    per-image metrics exactly (VERDICT r3 #4: end-to-end, not manual
    padding).  Shapes chosen so both the coarse bucket (en-face H 208 ->
    256, widths 160 -> 192) and the no-pad small-extent rule fire."""
    from multimodal_fusion_fpn_tpu import metrics as M
    from multimodal_fusion_fpn_tpu.data.synthetic import make_synthetic_hrf
    from multimodal_fusion_fpn_tpu.config import make_config
    from multimodal_fusion_fpn_tpu.eval.configs import opt_factory
    from multimodal_fusion_fpn_tpu.eval.harness import (
        create_val_dataloader, run_evaluation_instance)
    from multimodal_fusion_fpn_tpu.train.optim import sgd
    from multimodal_fusion_fpn_tpu.train.state import create_train_state
    from multimodal_fusion_fpn_tpu.train.step import model_batch

    paths = make_synthetic_hrf(str(tmp_path / "data"), n_patients=2,
                               d=48, h=80, w=160, enface_h=208,
                               enface_w=160, seed=7)
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo", training_dataset="hrf_fusion",
                      data_root=paths["oct"])
    opt = opt_factory["hrf_fusion"](cfg)
    transform_val = opt.get_val_transforms()
    import json
    with open(paths["split"]) as f:
        val_ids = json.load(f)["test"]

    model = build_model(cfg, spec=tiny_spec, remat=False)
    probe = create_val_dataloader(opt, val_ids, transform_val,
                                  num_workers=0)
    example = model_batch(next(iter(probe)))
    st = create_train_state(model, sgd(0.1), jax.random.PRNGKey(0),
                            example)
    members = [{"params": st.params, "batch_stats": st.batch_stats}]

    def run(bucket, outdir, eval_batch=1):
        metrics = {"Dice": M.Dice(output_key="prediction",
                                  target_key="mask", slice=0),
                   "BCE": M.BCE(output_key="prediction",
                                target_key="mask", slice=0)}
        results, rd = [], {}
        all_outputs = {"pred": np.array([]), "gt": np.array([])}
        run_evaluation_instance(
            opt, all_outputs, val_ids, transform_val, model, members,
            metrics, results, rd, str(tmp_path / outdir),
            shape_bucket=bucket, eval_batch=eval_batch)
        return results

    rows_exact = run(0, "out0")
    rows_bucket = run(64, "out64")
    # round 5: volume-batched dispatch (same-true-shape grouping) must
    # be metric-identical and order-preserving vs the per-image loop
    rows_batched = run(64, "out64b", eval_batch=2)
    assert rows_exact and len(rows_exact) == len(rows_bucket)
    assert len(rows_batched) == len(rows_exact)
    for re_, rb, rb2 in zip(rows_exact, rows_bucket, rows_batched):
        assert re_.keys() == rb.keys() == rb2.keys()
        for metric, v in re_.items():
            if isinstance(v, str):
                assert rb[metric] == v
                assert rb2[metric] == v
                continue
            np.testing.assert_allclose(
                rb[metric], v, rtol=1e-5, atol=1e-6,
                err_msg=f"{re_['FileSetId']}/{metric}")
            np.testing.assert_allclose(
                rb2[metric], rb[metric], rtol=1e-6, atol=1e-7,
                err_msg=f"batched {re_['FileSetId']}/{metric}")


@pytest.mark.parametrize("name", ["FPN", "FPNHybridFusion"])
def test_exact_bucketing_fused_eval_path(name, tiny_spec):
    """Round 4: under exact bucketing the EVAL path keeps the FUSED
    encoder kernels (extent-masked prologues + packed pools + epilogue
    masks) instead of falling back to per-op — and must still
    reproduce the unbucketed prediction.  Runs the fused lowering's
    XLA twin on CPU (the kernel bodies are proven equal to the twin in
    tests/test_pallas_interpret.py::test_fused_conv_dyn_kernel_parity)."""
    from multimodal_fusion_fpn_tpu.models.blocks import (
        set_fused_stage_mode)

    rng = np.random.default_rng(9)
    y, z, x = 8, 64, 32
    eh, ew = 80, 32
    batch = {"image": rng.normal(size=(1, 1, y, z, x)).astype(np.float32)}
    if name == "FPNHybridFusion":
        batch["slo"] = rng.normal(size=(1, 1, eh, 1, ew)).astype(
            np.float32)
        cfg = make_config(model=name, crop="relative_2d_max",
                          fusion_modality="slo")
    else:
        cfg = make_config(model=name, crop="oct")
    model = build_model(cfg, spec=tiny_spec, remat=False)

    set_fused_stage_mode("on")
    try:
        vs = model.init({"params": jax.random.PRNGKey(0)}, batch,
                        train=False)
        ref = np.asarray(model.apply(vs, batch,
                                     train=False)["prediction"])
        padded = {
            "image": _pad_to(batch["image"], {2: 16, 3: 96, 4: 48}),
            "__valid_image__": jnp.asarray([y, z, x], jnp.int32)}
        if "slo" in batch:
            padded["slo"] = _pad_to(batch["slo"], {2: 96, 4: 48})
            padded["__valid_enface__"] = jnp.asarray([eh, ew], jnp.int32)
        out = np.asarray(model.apply(vs, padded,
                                     train=False)["prediction"])
    finally:
        set_fused_stage_mode("auto")
    got = out[:, :, :y, :, :x]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_exact_bucketing_chain_eval_path(monkeypatch, tiny_spec):
    """MMF_FUSED_CHAIN=1 under exact bucketing: the whole-block chain
    kernels (XLA twin on CPU; kernel bodies proven in
    tests/test_fused_stage.py::test_eval_chain_kernel_dyn_interpret)
    must reproduce the unbucketed per-op prediction at model level."""
    import os
    from multimodal_fusion_fpn_tpu.models.blocks import (
        set_fused_stage_mode)

    rng = np.random.default_rng(9)
    y, z, x = 8, 64, 32
    eh, ew = 80, 32
    batch = {
        "image": rng.normal(size=(1, 1, y, z, x)).astype(np.float32),
        "slo": rng.normal(size=(1, 1, eh, 1, ew)).astype(np.float32)}
    cfg = make_config(model="FPNHybridFusion", crop="relative_2d_max",
                      fusion_modality="slo")
    model = build_model(cfg, spec=tiny_spec, remat=False)

    set_fused_stage_mode("on")
    try:
        vs = model.init({"params": jax.random.PRNGKey(0)}, batch,
                        train=False)
        ref = np.asarray(model.apply(vs, batch,
                                     train=False)["prediction"])
        monkeypatch.setitem(os.environ, "MMF_FUSED_CHAIN", "1")
        padded = {
            "image": _pad_to(batch["image"], {2: 16, 3: 96, 4: 48}),
            "__valid_image__": jnp.asarray([y, z, x], jnp.int32),
            "slo": _pad_to(batch["slo"], {2: 96, 4: 48}),
            "__valid_enface__": jnp.asarray([eh, ew], jnp.int32)}
        out = np.asarray(model.apply(vs, padded,
                                     train=False)["prediction"])
    finally:
        set_fused_stage_mode("auto")
    got = out[:, :, :y, :, :x]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
