#!/usr/bin/env bash
# Run the pytest suite as N concurrent single-process shards (default 4).
#
# Rationale: the suite's wall time is dominated by serial driver-side
# plan compilation inside one JVM (see PLANS.md "suite wall time"), so
# a second PROCESS scales where more executor threads don't. There is
# no pytest-xdist in this container; tests/conftest.py's --shard i/N
# option assigns whole test FILES greedily by measured cost, and this
# script fans the shards out and aggregates exit codes.
#
# Each shard builds its own SparkSession (UI disabled, tmp_path-scoped
# state dirs), so processes share nothing but the read-only testdata.
#
# Usage: scripts/test_sharded.sh [N]   (default N=4)
set -u
N="${1:-4}"
cd "$(dirname "$0")/.."
pids=()
t0=$SECONDS
for i in $(seq 0 $((N - 1))); do
  python -m pytest tests/ -q --shard "$i/$N" >"/tmp/pytest_shard_$i.log" 2>&1 &
  pids+=($!)
done
rc=0
for i in $(seq 0 $((N - 1))); do
  if ! wait "${pids[$i]}"; then rc=1; fi
  echo "--- shard $i/$N: $(tail -1 "/tmp/pytest_shard_$i.log")"
done
echo "total wall: $((SECONDS - t0))s rc=$rc"
exit $rc
