#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (BASELINE.json
# north_rule: "launches via spark-submit --py-files on multi-executor
# clusters"). Both packages ship: xkit is the stdlib-only parsing core,
# xhtmlkit_spark the Spark layer. Usage:
#
#   scripts/make_pyfiles.sh [out.zip]       # default: xkit.zip
#   spark-submit --master ... --py-files xkit.zip scripts/run_pipeline.py ...
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-xkit.zip}"
rm -f "$out"
# __pycache__ dirs are pruned in the walk below; zip contents are
# deterministic enough for --py-files (executors only import)
python - "$out" <<'EOF'
import os, sys, zipfile

out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for pkg in ("xkit", "xhtmlkit_spark"):
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, p)
print(out)
EOF
