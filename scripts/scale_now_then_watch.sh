#!/bin/bash
# 1) Run the interleaved scaling bench NOW (contended host accepted —
#    per-side minima over interleaved rounds partially de-noise), park
#    the result at BENCH/scaling_r3_contended.md.
# 2) Then hand off to scale_watch.sh, which waits for a quiet window
#    and parks BENCH/scaling_r3_candidate.md.
cd /root/repo || exit 1
LOG=/tmp/scaling_bench_r3.log
echo "CONTENDED RUN start $(date -u)" >> "$LOG"
python scripts/host_probe.py >> "$LOG" 2>&1
python scripts/scaling_bench.py --runs 5 >> "$LOG" 2>&1
if [ -f BENCH/BASELINE.md ] && ! git diff --quiet -- BENCH/BASELINE.md; then
  mv BENCH/BASELINE.md BENCH/scaling_r3_contended.md
  git checkout -- BENCH/BASELINE.md
  echo "PARKED contended result at BENCH/scaling_r3_contended.md $(date -u)" >> "$LOG"
fi
exec bash /root/repo/scripts/scale_watch.sh
