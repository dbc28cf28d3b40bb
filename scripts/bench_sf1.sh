#!/bin/sh
# Standing sf1 bench artifact (r15, VERDICT r14 #7): materialize the
# 10x fact-table dataset if absent, then run the FROZEN 15-query r1
# subset against it and print the one-line JSON. Redirect to
# BENCH_sf1_r{N}.json at round close:
#   sh scripts/bench_sf1.sh > BENCH_sf1_r15.json
set -e
SF1_DIR="${SPARK_GRAFT_SF1_DIR:-/tmp/engage_sf1}"
if [ ! -e "$SF1_DIR/lineitem.parquet" ]; then
    python "$(dirname "$0")/make_sf1.py" "$SF1_DIR" >&2
fi
SPARK_GRAFT_SF_DIR="$SF1_DIR" SPARK_GRAFT_BENCH_SUBSET=r1 python "$(dirname "$0")/../bench.py"
