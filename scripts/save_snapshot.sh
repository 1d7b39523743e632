#!/usr/bin/env bash
# Dev utility: dump the repo tree + source contents to snapshot.txt
# (capability parity with the reference's save_snapshot.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=snapshot.txt
{
  echo "# latentrag-tpu snapshot — $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo
  echo "## Tree"
  git ls-files | sort
  echo
  echo "## Contents"
  git ls-files '*.py' '*.cpp' '*.yaml' '*.toml' '*.md' Makefile | while read -r f; do
    echo
    echo "===== $f ====="
    cat "$f"
  done
} > "$OUT"
echo "wrote $OUT ($(wc -l < "$OUT") lines)"
