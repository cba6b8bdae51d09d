#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission (north-rule packaging):
#   scripts/build_pyfiles.sh [out.zip]      # default: dist/engine.zip
#   spark-submit --py-files dist/engine.zip jobs/run_partition.py ...
# The zip contains only the library package (pure .py, no tests/fixtures), so
# executors unpack a minimal artifact.
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-dist/engine.zip}"
mkdir -p "$(dirname "$out")"
rm -f "$out"
# -x: exclude caches; zip from repo root so the package dir is the zip root
zip -qr "$out" split_merge_partitioner_spark -x '*__pycache__*' -x '*.pyc'
echo "$out"
unzip -l "$out" | tail -2
