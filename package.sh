#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit deployment:
#   ./package.sh && spark-submit --py-files dist/inspectehr_spark.zip \
#       inspectehr_spark/pipeline/run.py --pages ... --out ...
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/inspectehr_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/inspectehr_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("inspectehr_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/inspectehr_spark.zip")
EOF
