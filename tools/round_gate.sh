#!/usr/bin/env bash
# One-shot round gate (the builder's pre-commit flow, VERDICT r8 item #4):
# compile, full specs, Verify + DuckDB oracle at sf0.001 AND sf0.01 (the
# declared-vs-checked guard runs inside check_oracle.py), then a recorded
# bench artifact checked by the builder's own gate. Exits non-zero on the
# first failure; prints ROUND GATE: ALL GREEN only when everything held.
set -euo pipefail
cd "$(dirname "$0")/.."

# Fail fast on the required env var BEFORE the (long) gate run — forgetting
# it used to waste the whole bench and exit without persisting the artifact.
round="${GRAFT_ROUND:?set GRAFT_ROUND=<k> so the gate bench is persisted as BENCH_GATE_r<k>.json}"

sbt -batch compile
sbt -batch test

for sf in 0.001 0.01; do
  out="/tmp/graft_gate_sf$sf"
  rm -rf "$out"
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out"
  python3 tools/check_oracle.py "/root/testdata/sf$sf" "$out"
done

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" | tee /tmp/graft_gate_bench.log
grep -o '{"metric".*' /tmp/graft_gate_bench.log | head -1 > /tmp/graft_gate_bench.json
python3 tools/check_bench.py /tmp/graft_gate_bench.json

# Persist the quiet gate artifact IN THE REPO as this round's reference
# (round-11 verdict #6: the trustworthy quiet numbers lived only in /tmp and
# the judge had to be told where; BENCH_GATE_r<k>.json is also what the next
# round's Bench loads for its settled-but-slow contention guard).
cp /tmp/graft_gate_bench.json "BENCH_GATE_r${round}.json"
echo "gate bench persisted: BENCH_GATE_r${round}.json"

echo "ROUND GATE: ALL GREEN"
