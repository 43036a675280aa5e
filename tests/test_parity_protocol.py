"""Turnkey parity-protocol runner (VERDICT r3 item 5).

tools/parity_protocol.py --mode oracle is the CI-runnable golden run:
from identical weights, this framework and the PL-free torch oracle
(certified equal to the actual reference by
test_oracle_certification.py) free-run SGD on the SAME batch stream
from the REAL data pipeline (crop/augment/normalize transforms), then
compare the loss trajectory and the val-split predictions/Dice.  This
extends test_training_dynamics.py beyond single synthetic batches to
the full multi-step pipeline-fed recipe.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import pytest


@pytest.mark.slow
def test_oracle_protocol_passes(tmp_path):
    import parity_protocol as pp
    report = pp.run_oracle_protocol(None, str(tmp_path), steps=2,
                                    batch_size=2)
    assert report["pass"], {k: v for k, v in report.items()
                            if k not in ("trajectory", "per_image")}
    # f64 free-running: deltas at reduction-noise level only
    assert report["max_loss_delta"] < 1e-9
    assert report["max_dice_delta"] == 0.0
    assert len(report["trajectory"]) == 2
    assert report["per_image"]  # val split evaluated on both sides


def test_artifact_schema_checker(tmp_path):
    import json
    import parity_protocol as pp
    # complete artifact tree -> clean report
    d = tmp_path / "out"
    d.mkdir()
    for f in pp.ARTIFACT_SCHEMA["run_files"]:
        if f == "mean_results.json":
            (d / f).write_text(json.dumps(
                {"Dice": {s: 0.5 for s in
                          pp.ARTIFACT_SCHEMA["mean_results_stats"]}}))
        else:
            (d / f).write_text("{}")
    rep = pp._check_artifacts(str(d))
    assert rep["missing_run_files"] == []
    assert rep["missing_stats"] == {}
    # missing stat detected
    (d / "mean_results.json").write_text(json.dumps(
        {"Dice": {"mean": 0.5}}))
    rep = pp._check_artifacts(str(d))
    assert "median" in rep["missing_stats"]["Dice"]
