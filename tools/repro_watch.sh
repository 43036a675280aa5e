#!/bin/bash
# Retry the full-geometry on-chip backward discriminator until it
# lands (results/repro_dx_s1full.jsonl non-empty) — the round-5 open
# item: which construct Mosaic miscompiles at RX=7936/CC=128
# (CPU interpret at the same geometry is 8/8 clean).
cd /root/repo || exit 1
for i in $(seq 1 60); do
  if [ -s results/repro_dx_s1full.jsonl ] && \
     [ "$(wc -l < results/repro_dx_s1full.jsonl)" -ge 14 ]; then
    echo "$(date +%s) s1full repro complete" >> results/tunnel_watch_r5.log
    exit 0
  fi
  if python tools/probe_tunnel.py --timeout 120 > /dev/null 2>&1; then
    timeout 5400 python tools/repro_dx_bf16.py --geo s1full \
        --log results/repro_dx_s1full.jsonl \
        >> results/stage_repro_s1full.log 2>&1
  fi
  sleep 240
done
