#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule run mode).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/prase_spark.zip
zip -qr dist/prase_spark.zip prase_spark -x '*__pycache__*'
echo "dist/prase_spark.zip"
echo "run: spark-submit --py-files dist/prase_spark.zip scripts/run_pipeline.py --help"
