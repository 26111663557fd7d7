#!/usr/bin/env bash
# One-command reproduction of every gate the round driver applies:
#   1. full ScalaTest suite
#   2. Verify dump at sf0.01 + DuckDB oracle compare (the correctness gate)
#   3. full Bench at sf0.1 + spread regression vs the committed baseline
# Run serially on purpose — two concurrent Spark JVMs taint every timing
# on this class of machine. ~20 min end to end.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== gate 1/3: sbt test ==="
sbt -batch test

echo "=== gate 2/3: correctness (Verify + DuckDB oracle, sf0.01) ==="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gates_verify"
python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/gates_verify

echo "=== gate 3/3: bench regression (sf0.1 vs BENCH_BASELINE.json) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  2>/dev/null | grep -o '{"metric".*}' > /tmp/gates_bench.json
python3 tools/check_bench_regression.py BENCH_BASELINE.json /tmp/gates_bench.json

echo "=== all gates clean ==="
