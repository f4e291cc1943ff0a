#!/usr/bin/env bash
# Cluster launch shape (north rule: spark-submit --py-files on a
# multi-executor cluster). Locally this degrades to local[*].
#
# Usage: scripts/submit_extract.sh <input parquet> <output dir> [extra args]
set -euo pipefail
cd "$(dirname "$0")/.."

INPUT=${1:?input parquet path}
OUTPUT=${2:?output dir}
shift 2 || true

# package the engine for executor distribution
ZIP=$(mktemp -d)/ner_ocr_spark.zip
python - <<PY
import zipfile, pathlib
z = zipfile.ZipFile("$ZIP", "w")
for p in pathlib.Path("ner_ocr_spark").rglob("*.py"):
    z.write(p, p.as_posix())
z.close()
PY

exec spark-submit \
  --master "${SPARK_MASTER:-local[*]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-200}" \
  scripts/run_extract.py -i "$INPUT" -o "$OUTPUT" "$@"
