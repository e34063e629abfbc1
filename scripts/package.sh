#!/usr/bin/env bash
# Package the engine for cluster submission:
#   ./scripts/package.sh  ->  dist/spider_spark.zip
# then:
#   spark-submit --py-files dist/spider_spark.zip scripts/submit_crawl.py \
#       --workdir /path/on/shared/fs --rounds 5
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/spider_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/spider_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("spider_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/spider_spark.zip")
EOF
