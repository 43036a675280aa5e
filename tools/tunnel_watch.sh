#!/bin/bash
# Idempotent tunnel watcher: probe every ~8 min; on the first success,
# run the fast kernel triage, then the round-4 measurement batch (all
# phases subprocess-bounded and idempotent), then one bench pass.
# Results: /tmp/onchip_r4.jsonl, /tmp/kernel_triage.log, /tmp/bench_watch.json
cd /root/repo
for i in $(seq 1 200); do
  if python tools/probe_tunnel.py --timeout 120 > /dev/null 2>&1; then
    echo "$(date +%s) tunnel UP — starting measurement batch" >> /tmp/tunnel_watch.log
    timeout 1800 python tools/check_kernels_onchip.py --strided \
        > /tmp/kernel_triage.log 2>&1
    timeout 14000 python tools/onchip_r4.py >> /tmp/tunnel_watch.log 2>&1
    BENCH_DEADLINE_S=2400 timeout 2600 python bench.py --sweep \
        > /tmp/bench_watch.json 2>> /tmp/tunnel_watch.log
    echo "$(date +%s) measurement batch done" >> /tmp/tunnel_watch.log
    exit 0
  fi
  sleep 480
done
