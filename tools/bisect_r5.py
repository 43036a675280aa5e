#!/usr/bin/env python3
"""Automated full-step Mosaic-compile bisect of the round-4 kernel flags.

BENCH_r04 evidence: tunnel probe green, then the flagship bf16 B=4
compile failed 3x on two compile servers with the documented Mosaic
rejection signature (`tpu_compile_helper subprocess exit code 1`,
HTTP 500).  The per-kernel triage (tools/check_kernels_onchip.py) tests
kernels in isolation at small shapes; THIS tool bisects at the full
flagship step, where the composition (flag interactions, full shapes,
remat) can fail even when each kernel passes alone.

Strategy (each attempt is a bounded subprocess running the bench child):
  1. default (all round-4 flags on).  OK -> done.
  2. one-OFF at a time, suspects first (MMF_G1, MMF_POOL_ROW are new
     Mosaic surfaces — VERDICT r4).  First single-off that passes names
     the culprit; keep testing the remaining suspects one-off to catch
     multiple independent breakers.
  3. if no single-off passes: all-off (the proven round-3 path), then
     one-ON at a time to find each breaker from the other side.

Results: one JSON line per attempt to --log (default
results/mosaic_bisect_r5.jsonl), plus a summary line with the inferred
broken-flag set.  tools/analyze_onchip_r4.env_advice() merges that set
into the advice bench.py applies, so the headline config self-heals
before any human flips a default in code.

Idempotent: completed attempts (by combo key) are skipped on re-run.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R4_FLAGS = ["MMF_G1", "MMF_POOL_ROW", "MMF_FUSED_2D", "MMF_YCHUNK",
            "MMF_MERGED_BWD", "MMF_FUSED_STATS"]

BROKEN_FILE = os.path.join(REPO, "results", "mosaic_broken_flags.json")


def _combo_key(off_flags):
    return "default" if not off_flags else "off:" + "+".join(
        sorted(off_flags))


def run_attempt(off_flags, timeout_s, extra_env=None):
    """Run the flagship bf16 B=4 step with ``off_flags`` disabled.

    Returns a result record; classification mirrors bench.py
    (_compile_rejection_sig for the deterministic-Mosaic read).
    """
    import bench
    env = dict(os.environ)
    for f in off_flags:
        env[f] = "0"
    if extra_env:
        env.update(extra_env)
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--child",
           "4", "bf16", "False"]
    t0 = time.time()
    rec = {"combo": _combo_key(off_flags), "off": sorted(off_flags)}
    try:
        proc = subprocess.run(cmd, env=env, capture_output=True,
                              text=True, timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        rec.update(ok=False, error=f"timeout after {timeout_s:.0f}s",
                   kind="timeout", wall_s=round(time.time() - t0, 1))
        return rec
    rec["wall_s"] = round(time.time() - t0, 1)
    for line in (proc.stdout or "").splitlines():
        if line.startswith(bench._RESULT_TAG):
            res = json.loads(line[len(bench._RESULT_TAG):])
            rec.update(ok=True, img_per_s=round(res["img_s"], 2),
                       ms_per_step=round(res["dt"] * 1000, 1))
            return rec
        if line.startswith(bench._ERROR_TAG):
            err = json.loads(line[len(bench._ERROR_TAG):])["error"]
            sig = bench._compile_rejection_sig(RuntimeError(err))
            rec.update(ok=False, error=err[:600],
                       kind="compile_rejection" if sig else "other")
            return rec
    rec.update(ok=False, kind="no_result",
               error=f"rc={proc.returncode}: "
                     f"{(proc.stderr or '')[-400:]}")
    return rec


def load_done(log):
    done = {}
    if os.path.exists(log):
        with open(log) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    if "combo" in r:
                        done[r["combo"]] = r
                except ValueError:
                    pass
    return done


def append(log, rec):
    os.makedirs(os.path.dirname(log) or ".", exist_ok=True)
    with open(log, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def write_broken(broken, evidence):
    os.makedirs(os.path.dirname(BROKEN_FILE), exist_ok=True)
    with open(BROKEN_FILE, "w") as f:
        json.dump({"broken_flags": sorted(broken),
                   "evidence": evidence,
                   "t": round(time.time())}, f, indent=1)
    print(f"# broken flags -> {BROKEN_FILE}: {sorted(broken)}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log",
                    default=os.path.join(REPO, "results",
                                         "mosaic_bisect_r5.jsonl"))
    ap.add_argument("--timeout", type=float, default=1200.0)
    ap.add_argument("--redo", action="store_true")
    args = ap.parse_args()

    done = {} if args.redo else load_done(args.log)

    def attempt(off):
        key = _combo_key(off)
        if key in done:
            print(f"# {key}: already done "
                  f"(ok={done[key].get('ok')})", flush=True)
            return done[key]
        rec = run_attempt(off, args.timeout)
        append(args.log, rec)
        done[key] = rec
        return rec

    # 1. default
    base = attempt([])
    if base.get("ok"):
        print("# default config compiles and runs — no bisect needed",
              flush=True)
        write_broken([], {"default": "ok"})
        return

    # 2. single-off, suspects first
    broken, evidence = set(), {"default": base.get("error", "")[:200]}
    single_pass = []
    for flag in R4_FLAGS:
        rec = attempt([flag])
        if rec.get("ok"):
            single_pass.append(flag)
            broken.add(flag)
            evidence[flag] = "single-off passes -> flag is the breaker"
            # keep probing the other NEW-surface suspects in case of
            # independent breakers, but stop burning budget on the
            # rest once one culprit is identified
            if flag not in ("MMF_G1", "MMF_POOL_ROW"):
                break
        else:
            evidence[flag] = rec.get("error", "")[:200]
    if single_pass:
        write_broken(broken, evidence)
        return

    # 3. all-off, then one-on at a time
    alloff = attempt(list(R4_FLAGS))
    if not alloff.get("ok"):
        print("# even the all-off (round-3) path fails — the breakage "
              "predates the round-4 flags; see the per-kernel triage",
              flush=True)
        write_broken(list(R4_FLAGS),
                     {"all_off": alloff.get("error", "")[:300],
                      **evidence})
        return
    for flag in R4_FLAGS:
        on = [f for f in R4_FLAGS if f != flag]  # only `flag` ON
        rec = attempt(on)
        if not rec.get("ok"):
            broken.add(flag)
            evidence[flag + ":solo-on"] = rec.get("error", "")[:200]
    write_broken(broken, evidence)


if __name__ == "__main__":
    main()
