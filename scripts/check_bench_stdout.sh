#!/bin/bash
# Regression guard for the driver's bench-parsing contract: the LAST line
# of `sbt "runMain graft.Bench"` stdout must be the bare metric JSON.
# Three rounds (r9-r11) of BENCH parsed:null came from sbt decoration —
# the forked JVM's stdout was re-logged with an "[info] " prefix and sbt
# appended "[success] Total time: ..." after main returned. build.sbt now
# sets `run / outputStrategy := Some(OutputStrategy.StdoutOutput)` and
# `Global / showSuccess := false`; this script asserts the end-to-end
# contract so a build.sbt edit can't silently regress it.
#
# Runs the full suite at sf0.001 (scale legs off, 1 run/query): ~8 min.
# Usage: scripts/check_bench_stdout.sh
set -e
cd "$(dirname "$0")/.."
OUT=$(mktemp /tmp/bench_stdout_check.XXXXXX)
trap 'rm -f "$OUT"' EXIT
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
SPARK_GRAFT_SCALE_BENCH=0 \
SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-8g} \
  sbt -batch "runMain graft.Bench" > "$OUT" 2>/dev/null
tail -1 "$OUT" | python3 -c '
import sys, json
line = sys.stdin.read().strip()
d = json.loads(line)  # raises -> nonzero exit if decorated/truncated
assert d.get("metric") == "total" and "queries" in d and "value" in d, d.keys()
val = d["value"]; nq = len(d["queries"])
print(f"OK: last stdout line is the bare metric JSON (value={val}s, {nq}+ queries)")
'
