#!/bin/bash
# End-of-round sweep runbook (VERDICT r13 #1/#8): run the two graded
# mains, refresh the machine-readable bench record, and END with the
# artifact add+commit so verdict-time `git status` is clean of round
# artifacts. The driver regenerates BENCH_r{N}/CORRECTNESS_r{N} after
# the round closes; this script commits everything the round produced
# in-repo (bench_queries.json, BASELINE.md updates, PROBES_r{N}.json)
# plus any prior round's driver artifacts still untracked.
#
# Usage: tools/round_sweep.sh <round-number> [sf-dir]
set -euo pipefail
cd "$(dirname "$0")/.."
N=${1:?usage: round_sweep.sh <round-number> [sf-dir]}
SF=${2:-/root/testdata/sf0.1}

# 1. correctness gate at the driver's grading SF
rm -rf /tmp/verify_sf0.01
sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_sf0.01'
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_sf0.01 \
  | tail -3

# 2. bench sweep at the driver's bench SF (writes bench_queries.json and
#    prints the compact tail-parseable line last). Stale graft temp dirs
#    are cleared first: the store-writing queries (q183-q189 family)
#    measurably slow against a populated /tmp (r19: q185 min-of-5 read
#    7.7s with ~1000 stale test/probe dirs, 4.4s after clearing), so a
#    dirty /tmp pollutes round-over-round comparison. Scoped by AGE
#    (round-19 ADVICE): a blanket rm raced any CONCURRENTLY running
#    test/bench JVM's live stores (all graft_* prefixed) into
#    missing-file failures — dirs touched in the last 30 min are
#    presumed live and left alone; the accumulated-session pollution the
#    clear targets is hours old
find /tmp -maxdepth 1 -name 'graft_*' -mmin +30 -exec rm -rf {} + 2>/dev/null || true
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch 'runMain graft.Bench' | grep '"metric"' | tail -1

# 2b. repo-root hygiene (VERDICT r16 nit): test runs leave Derby/Hive
#     droppings in the root; they're gitignored but clutter the listing
rm -rf derby.log spark-warehouse metastore_db

# 3. the add+commit the runbook must END with (VERDICT r10-r13): round
#    artifacts are committed HERE, not left for verdict time
git add -A bench_queries.json BASELINE.md 2>/dev/null || true
for f in "PROBES_r${N}.json" BENCH_r*.json CORRECTNESS_r*.json \
         LEAKCHECK.json COPYCHECK.json; do
  [ -e "$f" ] && git add "$f" || true
done
if ! git diff --cached --quiet; then
  git commit -m "Round ${N} sweep: bench/verify artifacts"
else
  echo "round ${N}: no artifact changes to commit"
fi
git status --short
