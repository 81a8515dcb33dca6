#!/usr/bin/env bash
# Package the engine and launch the extraction job via spark-submit.
# Usage: scripts/submit.sh [spark-submit opts...] -- [run_extract.py args...]
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="/tmp/tablestructurerec_spark_pkg.zip"

(cd "$REPO_ROOT" && rm -f "$ZIP" && zip -qr "$ZIP" tablestructurerec_spark -i '*.py')

SPARK_ARGS=()
APP_ARGS=()
seen_sep=0
for a in "$@"; do
  if [[ "$a" == "--" && $seen_sep -eq 0 ]]; then seen_sep=1; continue; fi
  if [[ $seen_sep -eq 0 ]]; then SPARK_ARGS+=("$a"); else APP_ARGS+=("$a"); fi
done

# cluster durability profile: durable checkpoint storage for iterative
# operators (dedup_components flips to reliable checkpoint() when set);
# point this at shared storage (HDFS/S3) on a real cluster
export SPARK_GRAFT_CKPT_DIR="${SPARK_GRAFT_CKPT_DIR:-/tmp/tsr-checkpoints}"

exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048 \
  "${SPARK_ARGS[@]}" \
  "$REPO_ROOT/scripts/run_extract.py" \
  "${APP_ARGS[@]}"
