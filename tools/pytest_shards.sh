#!/usr/bin/env bash
# Sharded pytest (VERDICT r9 item 6): run the suite as N concurrent
# pytest processes, each with its own Spark JVM on local[$CPUS] —
# identical coverage to `python -m pytest tests/ -q`, ~N× less wall.
#
# Safety: shards are whole FILES (module-level fixtures stay intact);
# every cross-test shared resource is either per-JVM (in-memory catalog,
# UI disabled, random driver ports) or per-test tmp_path (Derby dbs,
# stream checkpoints, bucketed-table paths).  The one port-binding
# module (test_standalone_cluster, master :7077) lives in exactly one
# shard like any other file.
#
# Usage: tools/pytest_shards.sh [N_SHARDS] [CPUS_PER_SHARD]
set -u
cd "$(dirname "$0")/.."
N=${1:-4}
CPUS=${2:-8}

# longest-first balancing proxy: assign files to shards round-robin by
# size-descending order
mapfile -t FILES < <(ls -S tests/test_*.py)
declare -a SHARD
for i in "${!FILES[@]}"; do
  s=$((i % N))
  SHARD[$s]="${SHARD[$s]:-} ${FILES[$i]}"
done

pids=()
for s in $(seq 0 $((N - 1))); do
  log="/tmp/pytest_shard_$s.log"
  # shellcheck disable=SC2086
  SPARK_GRAFT_CPUS=$CPUS python -m pytest ${SHARD[$s]} -q >"$log" 2>&1 &
  pids+=($!)
done

rc=0
for s in "${!pids[@]}"; do
  if ! wait "${pids[$s]}"; then rc=1; fi
  echo "--- shard $s (${SHARD[$s]}):"
  tail -3 "/tmp/pytest_shard_$s.log"
done
if [ $rc -ne 0 ]; then
  echo "SHARDED PYTEST: FAILURES (full logs: /tmp/pytest_shard_*.log)"
else
  echo "SHARDED PYTEST: all green"
fi
exit $rc
