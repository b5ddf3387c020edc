#!/usr/bin/env bash
# Gated rehearsal runner — turns the cluster/fault/volume rehearsals from
# SCALING.md prose into an asserted, re-runnable target. Every main here
# exits non-zero on divergence, so a regression in the executor-loss story,
# the multi-JVM reproduction, or the population-scale match path turns this
# script red instead of rotting silently.
#
# Usage:  tools/run_rehearsals.sh [quick|full]
#   quick (default): kill rehearsal (3 phases) + sf0.001 cluster sweep
#                    + 10^5 match-volume rehearsal            (~10 min)
#   full:            adds the sf0.1 bench-scale sweep (2048 MB executors)
#                    + 10^6 match-volume rehearsal            (~40 min)
#
# Intended cadence: quick per round / per merge, full weekly.
set -uo pipefail
cd "$(dirname "$0")/.."
MODE="${1:-quick}"

declare -a RESULTS=()
fail=0
run() {
  local name="$1"; shift
  echo "=== REHEARSAL $name: $* ==="
  local t0=$SECONDS
  if "$@"; then
    RESULTS+=("ok   $name ($((SECONDS - t0))s)")
  else
    RESULTS+=("FAIL $name ($((SECONDS - t0))s)")
    fail=1
  fi
}

run kill-rehearsal    sbt -batch "runMain graft.ClusterKillRehearsal /root/testdata/sf0.001 1024"
run cluster-sweep     sbt -batch "runMain graft.ClusterSweep /root/testdata/sf0.001 1024"
run match-volume-1e5  sbt -batch "runMain graft.covsonar.MatchVolumeRehearsal 100000 target/rehearsal-match-store"
run match-cluster-1e5 sbt -batch "runMain graft.covsonar.MatchClusterRehearsal 100000 1024"

if [ "$MODE" = "full" ]; then
  run cluster-sweep-sf01 sbt -batch "runMain graft.ClusterSweep /root/testdata/sf0.1 2048"
  run match-volume-1e6   sbt -batch "runMain graft.covsonar.MatchVolumeRehearsal 1000000 target/rehearsal-match-store"
  run match-cluster-1e6  sbt -batch "runMain graft.covsonar.MatchClusterRehearsal 1000000 2048"
  run date-partition-1e7 sbt -batch "runMain graft.covsonar.DatePartitionProbe 10000000 target/rehearsal-datepart"
fi

rm -rf target/rehearsal-match-store
echo "=== REHEARSAL SUMMARY ($MODE) ==="
printf '%s\n' "${RESULTS[@]}"
exit $fail
