#!/usr/bin/env python3
"""Summarize the round-4 on-chip measurement batch.

Reads the watcher outputs (/tmp/onchip_r4.jsonl, /tmp/bench_watch*.json,
/tmp/segment_split_r4.json, /tmp/kernel_triage.log) and prints:

  * the train A/B table (fused-stats / y-chunk / merged-backward
    contributions, batch sweep) with deltas vs the default config;
  * flag recommendations: any feature whose "off" phase is FASTER than
    the default gets a "flip the default" warning;
  * the eval phases (ensemble+HD, bucketed-dyn, pair/chain kernels);
  * the segment split with the round-3 reference numbers alongside.

Pure host-side file parsing — safe to run any time.
"""

import json
import os
import sys

R3_SEGMENTS = {  # PERF.md round-3 split at 191 ms (bf16 B=4)
    "enc3d_s1_fwdbwd": 50.7, "enc3d_s2_fwdbwd": 26.6,
    "enc3d_s3_fwdbwd": 14.7, "enc3d_s4_fwdbwd": 5.6,
    "enc3d_s5_fwdbwd": 4.8, "projections": 54.3,
    "enc2d": 6.6, "decoder": 4.9,
}


def load_jsonl(path):
    recs = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    recs.append(json.loads(line))
                except ValueError:
                    pass
    return recs


AB_PHASES = [
    ("train_b4_bf16_nows", "MMF_FUSED_STATS"),
    ("train_b4_bf16_noyck", "MMF_YCHUNK"),
    ("train_b4_bf16_nomerge", "MMF_MERGED_BWD"),
    ("train_b4_bf16_no2d", "MMF_FUSED_2D"),
    ("train_b4_bf16_nog1", "MMF_G1"),
    # (nopoolrow dropped round 5 — MMF_POOL_ROW default is OFF now)
]


_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BROKEN_FILE = os.path.join(_REPO, "results", "mosaic_broken_flags.json")
ONCHIP_LOGS = ("/tmp/onchip_r4.jsonl",
               os.path.join(_REPO, "results", "onchip_r5.jsonl"))


def env_advice(log=None, margin_ms=1.0, broken_file=BROKEN_FILE):
    """Flags whose measured "off" phase beat the default by more than
    ``margin_ms``, plus any flag the full-step Mosaic bisect
    (tools/bisect_r5.py) proved BROKEN on chip: returns {flag: "0"}.
    Used by bench.py so the recorded headline reflects the best
    A/B-verified *compilable* config even when nobody is around to flip
    a default between the measurement batch and the driver's bench
    run."""
    out = {}
    # compile-broken flags first (bisect evidence beats timing advice)
    if broken_file and os.path.exists(broken_file):
        try:
            with open(broken_file) as f:
                for flag in json.load(f).get("broken_flags", []):
                    out[flag] = "0"
        except (ValueError, OSError):
            pass
    logs = [log] if log else [p for p in ONCHIP_LOGS
                              if os.path.exists(p)]
    recs = {}
    for p in logs:
        recs.update({r["phase"]: r for r in load_jsonl(p)
                     if "phase" in r})
    base = recs.get("train_b4_bf16_ws")
    if base and "ms_per_step" in base:
        for phase, flag in AB_PHASES:
            r = recs.get(phase)
            if (r and "ms_per_step" in r
                    and r["ms_per_step"] < base["ms_per_step"]
                    - margin_ms):
                out[flag] = "0"
        # opt-in features: advice turns them ON when their phase BEATS
        # the default baseline (round 5: K-chunked pool rows)
        for phase, flag, value in (
                ("train_b4_bf16_rowk8", "MMF_POOL_ROWK", "8"),):
            r = recs.get(phase)
            if (r and "ms_per_step" in r
                    and r["ms_per_step"] < base["ms_per_step"]
                    - margin_ms):
                out[flag] = value
    return out


def main():
    if "--env-advice" in sys.argv:
        print(" ".join(f"{k}={v}" for k, v in env_advice().items()))
        return
    if len(sys.argv) > 1:
        logs = [sys.argv[1]]
    else:
        logs = [p for p in ONCHIP_LOGS if os.path.exists(p)]
    recs = {}
    for log in logs:
        recs.update({r["phase"]: r for r in load_jsonl(log)})
    if not recs:
        print(f"no results in {log} yet")
    base = recs.get("train_b4_bf16_ws")

    print("== train A/B (bf16 B=4 full step) ==")
    flips = []
    for phase, label, flag in [
            ("train_b4_bf16_ws", "default (stats+yck+merge)", None),
            ("train_b4_bf16_nows", "MMF_FUSED_STATS=0", "MMF_FUSED_STATS"),
            ("train_b4_bf16_noyck", "MMF_YCHUNK=0", "MMF_YCHUNK"),
            ("train_b4_bf16_nomerge", "MMF_MERGED_BWD=0",
             "MMF_MERGED_BWD"),
            ("train_b4_bf16_no2d", "MMF_FUSED_2D=0", "MMF_FUSED_2D"),
            ("train_b4_bf16_nog1", "MMF_G1=0", "MMF_G1"),
            ("train_b4_bf16_nopoolrow", "MMF_POOL_ROW=0",
             "MMF_POOL_ROW")]:
        r = recs.get(phase)
        if not r:
            print(f"  {label:32s} (pending)")
            continue
        d = ""
        if base and flag:
            delta = r["ms_per_step"] - base["ms_per_step"]
            d = f"  off-is{'-FASTER' if delta < 0 else '-slower'} " \
                f"by {abs(delta):.1f} ms"
            if delta < -1.0:
                flips.append((flag, delta))
        print(f"  {label:32s} {r['ms_per_step']:7.1f} ms "
              f"{r['img_per_s']:6.2f} img/s{d}")

    print("== batch sweep ==")
    for phase in ("train_b6_bf16_ws", "train_b8_bf16_remat_ws",
                  "train_b8_bf16_ws"):
        r = recs.get(phase)
        print(f"  {phase:32s} " + (f"{r['ms_per_step']:7.1f} ms "
                                   f"{r['img_per_s']:6.2f} img/s"
                                   if r else "(pending)"))

    print("== eval phases ==")
    for phase in ("eval_ensemble5_hd", "eval_ensemble5_hd_pair",
                  "eval_ensemble5_hd_chain", "eval_bucketed_dyn",
                  "eval_bucketed_dyn_chain"):
        r = recs.get(phase)
        print(f"  {phase:32s} " + (f"{r['ms_per_image']:7.1f} ms/img "
                                   f"{r['img_per_s']:6.2f} img/s"
                                   if r else "(pending)"))

    for tag, path in [("bench (first pass)", "/tmp/bench_watch.json"),
                      ("bench (final)", "/tmp/bench_watch_final.json")]:
        if os.path.exists(path):
            try:
                with open(path) as f:
                    d = json.loads(f.read().strip().splitlines()[-1])
                print(f"== {tag} ==\n  {json.dumps(d)[:240]}")
            except (ValueError, IndexError):
                print(f"== {tag} == unparseable")

    seg_path = "/tmp/segment_split_r4.json"
    if os.path.exists(seg_path):
        with open(seg_path) as f:
            seg = json.load(f)
        print("== segment split (vs round-3) ==")
        segs = seg.get("segments_ms", {})
        proj = sum(v for k, v in segs.items()
                   if k.startswith("proj") and k.endswith("fwdbwd"))
        for k, v in sorted(segs.items()):
            r3 = R3_SEGMENTS.get(k)
            ref = f"  (r3: {r3:.1f})" if r3 else ""
            print(f"  {k:36s} {v:7.1f} ms{ref}")
        if proj:
            print(f"  {'projections total':36s} {proj:7.1f} ms "
                  f"(r3: 54.3; VERDICT target <=35)")

    triage = "/tmp/kernel_triage.log"
    if os.path.exists(triage):
        with open(triage) as f:
            txt = f.read()
        bad = [ln for ln in txt.splitlines()
               if "FAIL" in ln or "Error" in ln or "error" in ln]
        print(f"== kernel triage == {'CLEAN' if not bad else 'ISSUES:'}")
        for ln in bad[:10]:
            print("  " + ln[:160])

    if flips:
        print("\n!! DEFAULT FLIPS RECOMMENDED:")
        for flag, delta in flips:
            print(f"  {flag}: off is {abs(delta):.1f} ms faster -> "
                  f"flip the default and re-run bench")


if __name__ == "__main__":
    main()
