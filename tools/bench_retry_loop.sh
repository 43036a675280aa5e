#!/bin/bash
# Re-run bench.py until a stale:false artifact lands (or 20 tries).
# Round-5 tail: the follow-up watcher's final sweep hit a tunnel dip
# and recorded a stale fallback; this loop keeps trying through flaps.
cd /root/repo || exit 1
for i in $(seq 1 20); do
  if python tools/probe_tunnel.py --timeout 120 > /dev/null 2>&1; then
    BENCH_DEADLINE_S=2000 timeout 2200 python bench.py \
        > results/bench_r5_final2.json 2>> results/stage_benchloop.log
    if ! grep -q '"stale": true' results/bench_r5_final2.json; then
      echo "$(date +%s) fresh bench artifact landed" \
          >> results/tunnel_watch_r5.log
      exit 0
    fi
  fi
  sleep 240
done
