#!/usr/bin/env bash
# The whole round gate as one command — compile, specs, correctness dump,
# DuckDB-oracle replica, flagship smoke, bench. Mirrors exactly what the
# driver runs, so round numbers are never hand-assembled.
#
#   tools/verify_all.sh              # full gate (specs + verify + bench)
#   tools/verify_all.sh --fast       # skip the ScalaTest suite
#
# Outputs: /tmp/verify_out (engine dumps + oracle_sql.json),
#          BENCH_local.json (one bench JSON line, same shape as BENCH_r{N}).
set -euo pipefail
cd "$(dirname "$0")/.."

SF_VERIFY=${SF_VERIFY:-/root/testdata/sf0.01}
SF_BENCH=${SF_BENCH:-/root/testdata/sf0.1}
CPUS=${SPARK_GRAFT_CPUS:-8}

echo "== compile =="
sbt -batch compile | tail -1

if [[ "${1:-}" != "--fast" ]]; then
  echo "== specs =="
  sbt -batch test 2>&1 | grep -E "Tests: |All tests"
fi

echo "== correctness dump ($SF_VERIFY) =="
rm -rf /tmp/verify_out
SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.Verify $SF_VERIFY /tmp/verify_out" 2>&1 \
  | grep -E '\[verify\].*failed' && { echo "VERIFY FAILURES"; exit 1; } || true

echo "== oracle replica =="
python3 tools/check_oracle.py "$SF_VERIFY" /tmp/verify_out | tail -3

echo "== entry smoke =="
sbt -batch "runMain graft.EntrySmoke" 2>&1 | grep entry-smoke

echo "== bench ($SF_BENCH, min-of-2 inside Bench) =="
SPARK_GRAFT_SF_DIR=$SF_BENCH SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>&1 \
  | grep '"metric"' | sed 's/^\[info\] //' | tee BENCH_local.json
