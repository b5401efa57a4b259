#!/usr/bin/env bash
# All three gates in one shot (what the driver effectively runs):
#   1. pytest suite          2. oracle gate (engine + plain sessions)
#   3. bench JSON line
#
# r10 (VERDICT r9 item 6, identical coverage, ~70 -> ~45 min):
# - pytest runs as 4 concurrent 8-core shards (tools/pytest_shards.sh,
#   whole-file sharding; measured 9m15 vs 19-20m single-process)
# - the two oracle gates share one JVM (check_oracle.py --both: engine
#   pass, SparkContext restart, plain pass on the warmed JIT; measured
#   9m05 vs ~20m as two cold invocations)
# - the fleet bench still runs alone on an idle machine (it is the only
#   stage that MEASURES; gates only check)
set -e
cd "$(dirname "$0")/.."
echo "== never-checked guard =="
python tools/check_never_checked.py
echo "== doc-count guard =="
python tools/check_doc_counts.py
echo "== pytest (4 sharded JVMs) =="
bash tools/pytest_shards.sh 4 8
echo "== oracle (engine + plain sessions, one JVM) =="
python tools/check_oracle.py /root/testdata/sf0.01 --both
echo "== bench (3-pass fresh-JVM fleet; VERDICT r8 item 7) =="
python tools/bench_fleet.py 3 BENCH_local_fleet.json
