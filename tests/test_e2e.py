"""End-to-end: train via train.py, evaluate via validate_ensemble.py, on
synthetic data in the reference disk layout with a tiny architecture."""

import json
import os
from os.path import join

import numpy as np
import pytest


TINY_INI = """[architecture]
architecture-name=ModifiedUnet3D
is-deconv=false
channels=2,4,8,16,32
dropout=0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0
is-batchnorm=True
"""


@pytest.fixture(scope="module")
def run_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    os.makedirs(root / "data", exist_ok=True)
    from multimodal_fusion_fpn_tpu.data.synthetic import make_synthetic_hrf
    paths = make_synthetic_hrf(str(root / "data"), n_patients=6, d=16,
                               h=64, w=32, enface_h=80, enface_w=32,
                               seed=3)
    ini = root / "tiny.ini"
    ini.write_text(TINY_INI)
    return {"root": root, "paths": paths, "ini": str(ini)}


def _common_argv(run_dirs, extra):
    return [
        "--training-dataset", "hrf_fusion",
        "--model", "FPNHybridFusion",
        "--crop", "relative_2d_max",
        "--fusion-modality", "slo",
        "--version", "e2e_test",
        "--data-root", run_dirs["paths"]["oct"],
        "--split-name", "split",
        "--arch-config", run_dirs["ini"],
        "--multiplier", "2",
        "--batch-size", "2",
        "--epochs", "5",
        "--threads", "2",
    ] + extra


def test_train_and_ensemble_eval(run_dirs, monkeypatch):
    monkeypatch.chdir(run_dirs["root"])
    import train as train_entry
    train_entry.run(_common_argv(run_dirs, []))

    # artifacts from training
    from multimodal_fusion_fpn_tpu.config import parse_config
    from multimodal_fusion_fpn_tpu import paths as path_utils
    cfg = parse_config(_common_argv(run_dirs, []))
    model_path = path_utils.get_model_path(
        cfg, run_dirs["paths"]["split"], None)
    assert os.path.exists(join(model_path, "last.ckpt"))
    ckpts = [f for f in os.listdir(model_path) if f.startswith("epoch=")]
    assert len(ckpts) == 5, ckpts
    assert os.path.exists(join(model_path, "curves.json"))
    assert os.path.exists(join(model_path, "curves.svg"))
    with open(join(model_path, "curves.json")) as f:
        curves = json.load(f)
    assert len(curves["Dice (val)"]) == 5

    # idempotence: second run skips (parity with train.py:200-202)
    with pytest.raises(SystemExit) as exc:
        train_entry.run(_common_argv(run_dirs, []))
    assert exc.value.code == 0

    # --- ensemble evaluation ------------------------------------------
    import validate_ensemble as eval_entry
    eval_argv = _common_argv(run_dirs, ["--save-all-outputs"])
    eval_entry.run(eval_argv)

    out_root = join(str(run_dirs["root"]), "__test")
    found = []
    for dirpath, _dirnames, filenames in os.walk(out_root):
        if "mean_results.json" in filenames:
            found.append(dirpath)
    assert len(found) == 1
    out = found[0]
    with open(join(out, "mean_results.json")) as f:
        mean_results = json.load(f)
    assert "Dice" in mean_results and "Hausdorff95" in mean_results
    assert os.path.exists(join(out, "test_output.csv"))
    assert os.path.exists(join(out, "results_dict.json"))
    npz = np.load(join(out, "all_outputs.npz"))
    assert npz["pred"].shape == npz["gt"].shape
    # per-image artifacts
    with open(join(out, "results_dict.json")) as f:
        rd = json.load(f)
    some_id = next(iter(rd))
    assert os.path.exists(join(out, some_id, "test.png"))
    assert os.path.exists(join(out, some_id, "test_soft.png"))
    assert os.path.exists(join(out, some_id, "info.json"))

    # idempotence of eval
    with pytest.raises(SystemExit) as exc:
        eval_entry.run(eval_argv)
    assert exc.value.code == 0

    # --- noise-robustness evaluation (separate output tree) -----------
    noise_argv = _common_argv(run_dirs, ["--noise", "slo-gaussian",
                                         "--noise-level", "0.2"])
    eval_entry.run(noise_argv)
    noise_found = []
    for dirpath, _dirnames, filenames in os.walk(
            join(str(run_dirs["root"]), "__test", "slo-gaussian-0.2")):
        if "mean_results.json" in filenames:
            noise_found.append(dirpath)
    assert len(noise_found) == 1
