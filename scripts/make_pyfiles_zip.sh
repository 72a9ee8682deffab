#!/bin/sh
# Build the --py-files artifact for spark-submit (north_rule: jobs run via
# spark-submit --py-files on a multi-executor cluster):
#   sh scripts/make_pyfiles_zip.sh
#   spark-submit --py-files dist/cuckoofilter_spark.zip jobs/build_filter.py ...
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/cuckoofilter_spark.zip
python3 - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/cuckoofilter_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("cuckoofilter_spark"):
        if "__pycache__" in root or "/.synth" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/cuckoofilter_spark.zip written")
EOF
