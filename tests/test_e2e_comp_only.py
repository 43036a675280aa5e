"""End-to-end FPN2D on the complementary-only config: exercises Disable,
the ±90° en-face rotation pipeline, the 512-resize, and the FPN2D
output-to-mask trilinear resize."""

import json
import os
from os.path import join

import pytest

TINY_INI = """[architecture]
architecture-name=ModifiedUnet3D
is-deconv=false
channels=2,2,4,4,8
dropout=0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0
is-batchnorm=True
"""


@pytest.mark.slow
def test_fpn2d_comp_only_train_eval(tmp_path, monkeypatch):
    from multimodal_fusion_fpn_tpu.data.synthetic import make_synthetic_hrf
    paths = make_synthetic_hrf(str(tmp_path / "data"), n_patients=6, d=16,
                               h=64, w=32, enface_h=64, enface_w=32,
                               seed=7)
    ini = tmp_path / "tiny.ini"
    ini.write_text(TINY_INI)

    argv = [
        "--training-dataset", "hrf_fusion_comp_only",
        "--model", "FPN2D",
        "--crop", "none",
        "--fusion-modality", "slo",
        "--version", "comp_only",
        "--data-root", paths["oct"],
        "--split-name", "split",
        "--arch-config", str(ini),
        "--multiplier", "1",
        "--batch-size", "1",
        "--epochs", "5",
        "--threads", "0",
    ]
    monkeypatch.chdir(tmp_path)
    import train as train_entry
    train_entry.run(argv)

    from multimodal_fusion_fpn_tpu.config import parse_config
    from multimodal_fusion_fpn_tpu import paths as path_utils
    cfg = parse_config(argv)
    model_path = path_utils.get_model_path(cfg, paths["split"], None)
    ckpts = [f for f in os.listdir(model_path) if f.startswith("epoch=")]
    assert len(ckpts) == 5

    import validate_ensemble as eval_entry
    eval_entry.run(argv)
    found = []
    for dirpath, _d, filenames in os.walk(join(str(tmp_path), "__test")):
        if "mean_results.json" in filenames:
            found.append(dirpath)
    assert len(found) == 1
    with open(join(found[0], "mean_results.json")) as f:
        res = json.load(f)
    assert "Dice" in res
