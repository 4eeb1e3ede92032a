#!/usr/bin/env bash
# Self-contained CI for the graft library — the analogue of the
# reference's end-to-end workflow (.github/workflows/ci.yml: service DB
# -> DDL -> generate -> ingest -> transform -> load -> pytest -> row
# sanity). Here the stages are: compile -> full test suite -> oracle
# correctness gate at sf0.01 (every registered query vs DuckDB) -> one
# end-to-end Pipeline smoke run. Nonzero exit on any failure.
#
# Usage: tools/ci.sh [sfDir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.01}"
WORK="$(mktemp -d /tmp/graft-ci.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

echo "== [1/4] compile =="
sbt -batch compile Test/compile

echo "== [2/4] test suite =="
sbt -batch test

echo "== [3/4] oracle correctness gate ($SF) =="
sbt -batch "runMain graft.Verify $SF $WORK/verify"
# check.py exits nonzero on any FAIL line (set -e propagates it)
python3 tools/check.py "$SF" "$WORK/verify"

echo "== [4/4] pipeline smoke run =="
sbt -batch "runMain graft.Pipeline $SF $WORK/pipeline"
test -s "$WORK/pipeline/pipeline_execution_report.json"

echo "CI OK"
