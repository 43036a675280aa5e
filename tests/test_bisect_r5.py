"""tools/bisect_r5.py strategy + the broken-flag advice channel into
bench.py (round-5: a Mosaic-rejected default flag must self-heal in the
headline config without a human flipping a default in code)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import bisect_r5
from analyze_onchip_r4 import env_advice

REJ = ("INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500: "
       "tpu_compile_helper subprocess exit code 1")


def _drive(monkeypatch, tmp_path, behaviour):
    """Run bisect_r5.main() with run_attempt stubbed by ``behaviour``:
    a callable (off_flags) -> ok bool."""
    calls = []

    def fake_run(off, timeout_s, extra_env=None):
        calls.append(sorted(off))
        ok = behaviour(set(off))
        rec = {"combo": bisect_r5._combo_key(off), "off": sorted(off),
               "wall_s": 1.0}
        if ok:
            rec.update(ok=True, img_per_s=20.0, ms_per_step=200.0)
        else:
            rec.update(ok=False, error=REJ, kind="compile_rejection")
        return rec

    log = tmp_path / "bisect.jsonl"
    broken = tmp_path / "broken.json"
    monkeypatch.setattr(bisect_r5, "run_attempt", fake_run)
    monkeypatch.setattr(bisect_r5, "BROKEN_FILE", str(broken))
    monkeypatch.setattr(sys, "argv",
                        ["bisect_r5.py", "--log", str(log)])
    bisect_r5.main()
    data = json.loads(broken.read_text()) if broken.exists() else None
    return calls, data, log


def test_single_breaker_found(monkeypatch, tmp_path):
    # G1 is broken: default fails, off:MMF_G1 passes
    calls, data, _ = _drive(monkeypatch, tmp_path,
                            lambda off: "MMF_G1" in off)
    assert data["broken_flags"] == ["MMF_G1"]
    # found on the second attempt (default, then G1-off)
    assert calls[0] == [] and calls[1] == ["MMF_G1"]


def test_second_suspect_also_probed(monkeypatch, tmp_path):
    # POOL_ROW broken: G1-off alone still fails; POOL_ROW-off passes
    calls, data, _ = _drive(monkeypatch, tmp_path,
                            lambda off: "MMF_POOL_ROW" in off)
    assert data["broken_flags"] == ["MMF_POOL_ROW"]


def test_two_breakers_found_from_all_off(monkeypatch, tmp_path):
    # G1 AND POOL_ROW both broken: no single-off passes; all-off
    # passes; solo-on runs find each breaker
    bad = {"MMF_G1", "MMF_POOL_ROW"}

    def behaviour(off):
        return bad.issubset(off)

    calls, data, _ = _drive(monkeypatch, tmp_path, behaviour)
    assert set(data["broken_flags"]) == bad


def test_default_ok_short_circuits(monkeypatch, tmp_path):
    calls, data, _ = _drive(monkeypatch, tmp_path, lambda off: True)
    assert calls == [[]]
    assert data["broken_flags"] == []


def test_idempotent_resume(monkeypatch, tmp_path):
    # first run finds G1; a re-run must re-use the logged attempts
    calls1, _, log = _drive(monkeypatch, tmp_path,
                            lambda off: "MMF_G1" in off)
    calls2, data, _ = _drive(monkeypatch, tmp_path,
                             lambda off: "MMF_G1" in off)
    assert data["broken_flags"] == ["MMF_G1"]
    assert calls2 == []  # everything came from the log


def test_env_advice_merges_broken_flags(tmp_path):
    broken = tmp_path / "broken.json"
    broken.write_text(json.dumps(
        {"broken_flags": ["MMF_G1", "MMF_POOL_ROW"]}))
    adv = env_advice(log=str(tmp_path / "missing.jsonl"),
                     broken_file=str(broken))
    assert adv["MMF_G1"] == "0" and adv["MMF_POOL_ROW"] == "0"


def test_env_advice_no_broken_file(tmp_path):
    adv = env_advice(log=str(tmp_path / "missing.jsonl"),
                     broken_file=str(tmp_path / "nope.json"))
    assert adv == {}
