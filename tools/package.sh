#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (BASELINE.json:14).
# Usage: tools/package.sh [out.zip]   (default: dist/remediner_spark.zip)
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-dist/remediner_spark.zip}"
mkdir -p "$(dirname "$out")"
rm -f "$out"
zip -qr "$out" remediner_spark -x '*__pycache__*' -x '*.pyc'
echo "$out"
echo "run: spark-submit --py-files $out job.py --corpus-dir <dir> --out <dir>"
