#!/usr/bin/env bash
# Package the engine and run the flagship via spark-submit --py-files
# (north_rule deployment path). Local master here; on a cluster pass
# --master yarn/k8s and executor counts for the N vs 4N runs.
set -euo pipefail
cd "$(dirname "$0")"

scripts/build_dist.sh

N_IMAGES="${1:-100000}"
N_POLYS="${2:-32}"
OUT="${3:-/tmp/stac_geocore_assignments}"
MASTER="${SPARK_GRAFT_MASTER:-local[${SPARK_GRAFT_CPUS:-8}]}"

exec spark-submit \
  --master "$MASTER" \
  --py-files dist/stac_to_geocore_spark.zip \
  main.py "$N_IMAGES" "$N_POLYS" "$OUT"
