#!/bin/bash
# Watch for a quiet host window, then run the scaling bench once and PARK
# the result at BENCH/scaling_r3_candidate.md (committed BASELINE.md is
# restored untouched).  Log: /tmp/scaling_bench_r3.log
cd /root/repo || exit 1
LOG=/tmp/scaling_bench_r3.log
while true; do
  PROBE=$(python scripts/host_probe.py 2>/dev/null)
  if [ $? -eq 0 ]; then
    echo "QUIET $(date -u): $PROBE" >> "$LOG"
    python scripts/scaling_bench.py --runs 4 >> "$LOG" 2>&1
    if [ -f BENCH/BASELINE.md ]; then
      mv BENCH/BASELINE.md BENCH/scaling_r3_candidate.md
      git checkout -- BENCH/BASELINE.md
      echo "PARKED candidate at BENCH/scaling_r3_candidate.md $(date -u)" >> "$LOG"
    fi
    exit 0
  fi
  echo "busy $(date -u): $PROBE" >> "$LOG"
  sleep 180
done
