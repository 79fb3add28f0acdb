#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit on a multi-executor cluster.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f kgcompass_spark.zip
zip -qr kgcompass_spark.zip kgcompass_spark -x '*__pycache__*'
echo "built kgcompass_spark.zip ($(du -h kgcompass_spark.zip | cut -f1))"
echo "usage: spark-submit --py-files kgcompass_spark.zip <job.py>"
