#!/bin/bash
# Round-5 tunnel watcher: probe every ~5 min; while UP, advance through
# the measurement stages IN ORDER, each idempotent and individually
# bounded, with done-markers so a tunnel drop mid-batch resumes at the
# interrupted stage on the next UP.  All results live under results/
# (committed to the repo — VERDICT r4 item 3), not /tmp.
#
# Stage order (headline-first, diagnosis-first):
#   triage  — per-kernel bf16 Mosaic compile triage (small shapes, fast,
#             names the rejected kernel section)
#   bisect  — full-step flag bisect -> results/mosaic_broken_flags.json
#             (bench.py auto-applies via analyze_onchip_r4.env_advice)
#   bench1  — headline bench (fresh stale:false artifact candidate)
#   ab      — full A/B batch -> results/onchip_r5.jsonl
#   seg     — segment split -> results/segment_split_r5.json
#   bench2  — final bench sweep (warm cache, best advice applied)
cd /root/repo || exit 1
mkdir -p results results/watch_done
LOG=results/tunnel_watch_r5.log
note() { echo "$(date +%s) $*" >> "$LOG"; }

run_stage() {  # run_stage NAME TIMEOUT CMD...   (set OUT=<file> to
  local name=$1 tmo=$2; shift 2  # capture stdout separately)
  [ -f "results/watch_done/$name" ] && return 0
  note "stage $name START"
  if [ -n "$OUT" ]; then
    timeout "$tmo" "$@" > "$OUT" 2>> "results/stage_${name}.log"
  else
    timeout "$tmo" "$@" >> "results/stage_${name}.log" 2>&1
  fi
  local rc=$?
  note "stage $name rc=$rc"
  # rc=0 marks done; a failing stage is retried on the next UP cycle
  # unless it has now failed 3 times (then mark done-with-failure so
  # later stages still get tunnel time).
  if [ $rc -eq 0 ]; then
    touch "results/watch_done/$name"
    return 0
  fi
  local fails_file="results/watch_done/.${name}.fails"
  local n=$(( $(cat "$fails_file" 2>/dev/null || echo 0) + 1 ))
  echo "$n" > "$fails_file"
  if [ "$n" -ge 3 ]; then
    note "stage $name FAILED ${n}x — marking done-with-failure"
    touch "results/watch_done/$name"
  fi
  return 1
}

for i in $(seq 1 400); do
  if [ -f results/watch_done/bench2 ]; then
    note "all stages complete — watcher exiting"
    exit 0
  fi
  if python tools/probe_tunnel.py --timeout 120 > /dev/null 2>&1; then
    note "tunnel UP (cycle $i)"
    run_stage triage 2400 python tools/check_kernels_onchip.py \
        --strided --dtype bf16 || continue
    # bf16 backward localizer (round-5 triage found on-chip dx==0 +
    # ds/db garbage in EVERY pallas-vs-ref bf16 section; fwd/dw OK)
    run_stage repro_dx 1800 python tools/repro_dx_bf16.py || continue
    run_stage bisect 7200 python tools/bisect_r5.py || continue
    OUT=results/bench_r5.json run_stage bench1 2700 \
        env BENCH_DEADLINE_S=2400 python bench.py || continue
    # a stale bench result (tunnel dropped mid-bench) is not done —
    # retry it next UP cycle (bounded by the 3-fail rule)
    if grep -q '"stale": true' results/bench_r5.json 2>/dev/null; then
      n=$(( $(cat results/watch_done/.bench1.fails 2>/dev/null || echo 0) + 1 ))
      echo "$n" > results/watch_done/.bench1.fails
      if [ "$n" -lt 3 ]; then
        rm -f results/watch_done/bench1
        note "bench1 stale — will retry (attempt $n)"
        continue
      fi
    fi
    run_stage ab 14000 python tools/onchip_r4.py \
        --log results/onchip_r5.jsonl || continue
    run_stage seg 5400 python tools/profile_step.py --fast --dtype bf16 \
        --json results/segment_split_r5.json || continue
    OUT=results/bench_r5_final.json run_stage bench2 2200 \
        env BENCH_DEADLINE_S=1800 python bench.py --sweep || continue
  else
    note "tunnel down (cycle $i)"
  fi
  sleep 300
done
