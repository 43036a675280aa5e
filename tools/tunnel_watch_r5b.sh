#!/bin/bash
# Round-5 follow-up measurement batch (run AFTER tunnel_watch_r5.sh
# completes): fills in the A/B phases that failed during the
# mid-session MMF_POOL_ROW default flip, adds the kernel-part
# microbenches and the full-shape per-kernel triage.  Same staging /
# resume discipline as the main watcher; results under results/.
cd /root/repo || exit 1
mkdir -p results results/watch_done
LOG=results/tunnel_watch_r5.log
note() { echo "$(date +%s) $*" >> "$LOG"; }

run_stage() {  # set OUT=<file> to capture stdout separately
  local name=$1 tmo=$2; shift 2
  [ -f "results/watch_done/$name" ] && return 0
  note "stage $name START"
  if [ -n "$OUT" ]; then
    timeout "$tmo" "$@" > "$OUT" 2>> "results/stage_${name}.log"
  else
    timeout "$tmo" "$@" >> "results/stage_${name}.log" 2>&1
  fi
  local rc=$?
  note "stage $name rc=$rc"
  if [ $rc -eq 0 ]; then touch "results/watch_done/$name"; return 0; fi
  local ff="results/watch_done/.${name}.fails"
  local n=$(( $(cat "$ff" 2>/dev/null || echo 0) + 1 ))
  echo "$n" > "$ff"
  [ "$n" -ge 3 ] && { note "stage $name FAILED ${n}x — marking done"; \
                      touch "results/watch_done/$name"; }
  return 1
}

for i in $(seq 1 400); do
  if [ -f results/watch_done/bench_r5b ]; then
    note "follow-up batch complete — exiting"
    exit 0
  fi
  if python tools/probe_tunnel.py --timeout 120 > /dev/null 2>&1; then
    note "tunnel UP (r5b cycle $i)"
    # missed A/B phases (idempotent — done phases in the jsonl skip)
    run_stage ab2 10000 python tools/onchip_r4.py \
        --log results/onchip_r5.jsonl || continue
    # per-kernel costs vs memory floor (PERF.md kernel table refresh)
    run_stage parts 3600 python tools/bench_fused_parts.py \
        --dtype bf16 || continue
    # full-shape per-kernel compile+parity triage (names any Mosaic
    # breaker the full-step bisect can only localize to a flag)
    run_stage s1full 3600 python tools/check_kernels_onchip.py \
        --stage s1full --dtype bf16 --strided || continue
    OUT=results/bench_r5b.json run_stage bench_r5b 2200 \
        env BENCH_DEADLINE_S=1800 python bench.py --sweep || continue
  else
    note "tunnel down (r5b cycle $i)"
  fi
  sleep 300
done
