#!/bin/bash
# Run the benchmark with sbt logging suppressed so the bench's one-line
# JSON is the final stdout line (machine-readable without tail-scraping).
# Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like the bare main.
# The short headline JSON is also persisted at target/bench_short.json
# and the full per-query board at target/bench.json.
set -euo pipefail
cd "$(dirname "$0")/.."
exec sbt -batch -error "runMain graft.Bench" "$@"
