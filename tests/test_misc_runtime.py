"""Runtime odds and ends: the device-prefetch pipeline and the
features.png evaluation artifact path."""

import json
import os

import jax
import numpy as np
import pytest


def test_device_prefetch_order_and_types():
    from multimodal_fusion_fpn_tpu.utils import device_prefetch

    batches = [{"x": np.full((4, 4), i, np.float32), "id": f"b{i}"}
               for i in range(7)]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert float(np.asarray(b["x"])[0, 0]) == i  # order preserved
        assert isinstance(b["x"], jax.Array)         # arrays transferred
        assert b["id"] == f"b{i}"                    # metadata untouched


def test_device_prefetch_propagates_errors():
    from multimodal_fusion_fpn_tpu.utils import device_prefetch

    def gen():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("loader exploded")

    it = device_prefetch(gen(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="loader exploded"):
        list(it)


def test_device_prefetch_worker_exits_on_abandon():
    """Abandoning the generator early (exception in the consumer loop,
    GC) must release the worker thread instead of leaving it blocked on
    a bounded q.put with transferred batches pinned in device memory."""
    import threading
    import time

    from multimodal_fusion_fpn_tpu.utils import device_prefetch

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full(2, i, np.float32)}

    before = threading.active_count()
    it = device_prefetch(gen(), depth=1)
    next(it)
    it.close()  # consumer abandons the generator
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, \
        "prefetch worker thread still alive after generator close"
    assert len(produced) < 100  # worker stopped early, didn't drain all


def test_zdim_reduction_proj_cap_zero(monkeypatch):
    """MMF_FUSED_PROJ_CAP=0 must fall back to the classic per-op path
    (ADVICE r2: _FusedReduction crashed at trace time with cap=0)."""
    from multimodal_fusion_fpn_tpu.models import blocks

    monkeypatch.setenv("MMF_FUSED_PROJ_CAP", "0")
    monkeypatch.setenv("MMF_FUSED_PROJ", "1")  # even when forced on
    mod = blocks.ZDimReduction(features=4, num_reductions=2,
                               final_kernel=4)
    x = np.random.default_rng(0).normal(size=(1, 2, 8, 16, 2)).astype(
        np.float32)
    assert mod._fused_bs(jax.numpy.asarray(x)) is None
    vs = mod.init(jax.random.PRNGKey(0), x, train=False)
    y = mod.apply(vs, x, train=False)
    assert np.all(np.isfinite(np.asarray(y)))


def test_late_fusion_emits_out_features():
    from multimodal_fusion_fpn_tpu.config import make_config
    from multimodal_fusion_fpn_tpu.models.arch_config import ArchSpec
    from multimodal_fusion_fpn_tpu.models.zoo import build_model

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(1, 1, 8, 64, 32)).astype(np.float32),
        "slo": rng.normal(size=(1, 1, 80, 1, 32)).astype(np.float32),
    }
    cfg = make_config(model="FPNLateFusion", crop="relative_2d_max",
                      fusion_modality="slo")
    cfg.output_features = True
    model = build_model(cfg, spec=ArchSpec(channels=(2, 4, 8, 16, 32)))
    vs = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(vs, batch)
    assert "out_features" in out
    # concatenated 3D+2D branch features: channel dim = 2 * channels[0]
    assert out["out_features"].shape[1] == 4


def test_compute_metrics_saves_features_png(tmp_path):
    from multimodal_fusion_fpn_tpu.eval.harness import compute_metrics
    from multimodal_fusion_fpn_tpu.metrics import streaming as M

    rng = np.random.default_rng(0)
    batch = {
        "mask": (rng.random((1, 1, 8, 1, 16)) > 0.5).astype(np.float32),
        "FileSetId": ["img0"],
    }
    output = {
        "prediction": rng.random((1, 1, 8, 1, 16)).astype(np.float32),
        "out_features": rng.normal(size=(1, 4, 8, 1, 16)).astype(
            np.float32),
    }
    metrics_val = {"Dice": M.Dice(output_key="prediction",
                                  target_key="mask", slice=0)}
    all_outputs = {"pred": np.zeros(0), "gt": np.zeros(0)}
    results = []
    results_dict = {}
    compute_metrics(all_outputs, output, batch, metrics_val, results,
                    results_dict, str(tmp_path), save_data=True)
    sample = os.path.join(str(tmp_path), "img0")
    assert os.path.exists(os.path.join(sample, "features.png"))
    assert os.path.exists(os.path.join(sample, "test.png"))
    with open(os.path.join(sample, "info.json")) as fp:
        info = json.load(fp)
    assert "Dice" in info
