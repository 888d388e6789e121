#!/usr/bin/env bash
# Rebuild dist/stac_to_geocore_spark.zip from the package tree at HEAD.
# submit.sh runs this automatically; run it manually after editing package
# source so the committed artifact matches (tests/test_dist_zip.py enforces
# byte-parity between the zip and the tree).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/stac_to_geocore_spark.zip
zip -qr dist/stac_to_geocore_spark.zip stac_to_geocore_spark -x '*__pycache__*' -x '*.pyc'
echo "built dist/stac_to_geocore_spark.zip ($(unzip -l dist/stac_to_geocore_spark.zip | tail -1))"
