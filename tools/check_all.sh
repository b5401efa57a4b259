#!/usr/bin/env bash
# All three gates in one shot (what the driver effectively runs):
#   1. pytest suite          2. oracle gate (engine + plain sessions)
#   3. bench JSON line
set -e
cd "$(dirname "$0")/.."
echo "== never-checked guard =="
python tools/check_never_checked.py
echo "== doc-count guard =="
python tools/check_doc_counts.py
echo "== pytest =="
python -m pytest tests/ -q
echo "== oracle (engine session) =="
python tools/check_oracle.py
echo "== oracle (plain driver-like session) =="
python tools/check_oracle.py /root/testdata/sf0.01 --plain
echo "== bench (3-pass fresh-JVM fleet; VERDICT r8 item 7) =="
python tools/bench_fleet.py 3 BENCH_local_fleet.json
