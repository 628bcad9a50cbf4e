#!/usr/bin/env bash
# Package the library and run the extraction job via spark-submit --py-files
# (north_rule ship path).  Extra args are forwarded to scripts/run_extract.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DIST="$REPO/dist"
mkdir -p "$DIST"
ZIP="$DIST/apple_ocr_backend_spark.zip"
(cd "$REPO" && rm -f "$ZIP" && \
  find apple_ocr_backend_spark -name '*.py' | zip -q "$ZIP" -@)
exec spark-submit \
  --master "${SPARK_MASTER:-local[32]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$REPO/scripts/run_extract.py" "$@"
