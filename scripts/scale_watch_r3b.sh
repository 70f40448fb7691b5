#!/bin/bash
# Post-bench quiet-window watcher for round 3: wait for the current
# interleaved run to finish, then loop host_probe until the box goes
# quiet and run one more interleaved bench; park the result at
# BENCH/scaling_r3_quiet.md. Log: /tmp/scaling_watch_r3b.log
cd /root/repo || exit 1
LOG=/tmp/scaling_watch_r3b.log
while pgrep -f 'scaling_bench.py' >/dev/null; do sleep 30; done
echo "bench done, watching $(date -u)" >> "$LOG"
while true; do
  PROBE=$(python scripts/host_probe.py 2>/dev/null)
  if [ $? -eq 0 ]; then
    echo "QUIET $(date -u): $PROBE" >> "$LOG"
    python scripts/scaling_bench.py --runs 3 >> "$LOG" 2>&1
    if [ -f BENCH/BASELINE.md ] && ! git diff --quiet -- BENCH/BASELINE.md; then
      mv BENCH/BASELINE.md BENCH/scaling_r3_quiet.md
      git checkout -- BENCH/BASELINE.md
      echo "PARKED quiet result at BENCH/scaling_r3_quiet.md $(date -u)" >> "$LOG"
    fi
    exit 0
  fi
  echo "busy $(date -u): $PROBE" >> "$LOG"
  sleep 120
done
