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

# Loadavg precondition (r15 verdict #2: the r15 gate started at loadavg
# 9.18 and published ~1.35× uniformly-inflated rows that the judge's quiet
# probe contradicted). Wait until the 1-min load settles below the
# threshold; refuse after 30 min so a stuck box fails loudly instead of
# silently recording poisoned numbers. Override bar via GRAFT_MAX_LOAD.
# r16 verdict #5: the check runs TWICE — here, and again immediately before
# the bench step, because the 13-minute test suite between them leaves its
# own load behind (the r16 gate bench started at loadavg 3.38 despite a
# quiet gate start).
max_load="${GRAFT_MAX_LOAD:-1.0}"
wait_quiet() {
  local stage="$1"
  for i in $(seq 1 60); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $load < $max_load else 0)")
    [ "$ok" = 1 ] && break
    [ "$i" = 60 ] && { echo "GATE REFUSED ($stage): loadavg $load >= $max_load after 30 min"; exit 2; }
    echo "gate waiting ($stage): loadavg $load >= $max_load (attempt $i/60)"; sleep 30
  done
  echo "gate loadavg ($stage): $(cut -d' ' -f1-3 /proc/loadavg)"
}
wait_quiet start

sbt -batch compile
sbt -batch test | tee /tmp/graft_gate_test.log
grep -q "All tests passed." /tmp/graft_gate_test.log

for sf in 0.001 0.01; do
  out="/tmp/graft_gate_sf$sf"
  rm -rf "$out"
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out"
  python3 tools/check_oracle.py "/root/testdata/sf$sf" "$out"
done

# README counts are GENERATED here (r13 verdict #7: hand-maintained counts
# drifted three rounds running) — the gate rewrites them from the run it
# just did, so a count in the README is always a count that was measured.
specs=$(grep -o 'Total number of tests run: [0-9]*' /tmp/graft_gate_test.log \
  | tail -1 | grep -o '[0-9]*$')
queries=$(python3 -c "import json; print(len(json.load(open('/tmp/graft_gate_sf0.001/oracle_sql.json'))))")
sed -i -E "s/[0-9]+ specs, includes physical-plan audits/${specs} specs, includes physical-plan audits/" README.md
sed -i -E "s/one entry per operator; [0-9]+ queries/one entry per operator; ${queries} queries/" README.md
sed -i -E "s/SQL for ALL [0-9]+/SQL for ALL ${queries}/" README.md
echo "README counts synced: ${specs} specs, ${queries} queries"

wait_quiet pre-bench
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
