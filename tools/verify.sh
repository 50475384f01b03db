#!/usr/bin/env bash
# Pre-bench verification gate (round-3 VERDICT item 6): run BEFORE
# recording any bench numbers so value regressions are caught in-round.
#   1. full pytest suite
#   2. full registry parity sweep vs the DuckDB oracles at sf0.01
# Usage: tools/verify.sh [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
python -m pytest tests/ -q
python tools/parity.py "$SF_DIR"
