#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north rule: multi-executor
# execution is plain `spark-submit --py-files fluent_server_spark.zip`).
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-dist/fluent_server_spark.zip}"
mkdir -p "$(dirname "$out")"
rm -f "$out"
python - "$out" <<'EOF'
import sys, zipfile, pathlib
out = sys.argv[1]
root = pathlib.Path("fluent_server_spark")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print(f"wrote {out}")
EOF
cat <<USAGE
Submit with:
  spark-submit --py-files $out \\
    --conf spark.sql.adaptive.enabled=true \\
    --conf spark.sql.shuffle.partitions=<2x total cores> \\
    run_pipeline.py  # or: python -m fluent_server_spark ... in client mode
USAGE
