#!/usr/bin/env bash
# spark-submit packaging — the north rule's `spark-submit --py-files` path.
# Zips the library, submits the import job. On a real cluster, swap --master.
#
#   tools/submit.sh [extra import_job args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${SPARK_GRAFT_CPUS:-32}"
# first arg is the output dir ONLY if it is not a flag — so
# `tools/submit.sh --routed-export` passes the flag through instead of
# writing a bundle to a directory literally named './--routed-export'
OUT="/tmp/pgosm_flex_spark_out"
if [[ $# -gt 0 && "${1:0:1}" != "-" ]]; then
  OUT="$1"
  shift
fi

ZIP=$(mktemp -d)/pgosm_flex_spark.zip
(cd "$REPO" && zip -qr "$ZIP" pgosm_flex_spark)

spark-submit \
  --master "local[$CPUS]" \
  --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-48g}" \
  --py-files "$ZIP" \
  "$REPO/jobs/import_job.py" --out "$OUT" --cpus "$CPUS" "$@"
