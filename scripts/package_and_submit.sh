#!/usr/bin/env bash
# Package the engine and run the CLI job via spark-submit --py-files —
# the deployment path the production job uses on a multi-executor
# cluster (north rule). Usage:
#   scripts/package_and_submit.sh <term_dict_parquet> <edges_parquet> \
#       <ontology> <state_root> [reports_dir]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
TERM_DICT="$1"; EDGES="$2"; ONT="$3"; STATE_ROOT="$4"; REPORTS="${5:-}"

ZIP="$(mktemp -d)/ontology_loader_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" ontology_loader_spark -x '*__pycache__*')
echo "packaged: $ZIP"

ARGS=(--source-ontology "$ONT" --term-dict "$TERM_DICT" --edges "$EDGES"
      --state-root "$STATE_ROOT")
if [[ -n "$REPORTS" ]]; then ARGS+=(--output-directory "$REPORTS"); fi

# --master is inherited from spark-submit; on a real cluster replace
# local[*] with the cluster master / k8s / yarn URL.
exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$REPO/ontology_loader_spark/cli.py" "${ARGS[@]}"
