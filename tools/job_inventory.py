#!/usr/bin/env python
"""Per-query JOB INVENTORY via the Spark event log (the r13-continuation
instrument, committed as a tool in r14): for each query, run once warm
inside a job group and report every job (callsite) and stage (name,
tasks, shuffle read/write bytes, input bytes).  Shuffle BYTES are the
guide-§2 metric walls cannot give on a throttling sandbox — they are
deterministic for a fixed plan.

Usage:
    python tools/job_inventory.py <query> [query ...]

Output: one JSON line per query:
    {"name": ..., "n_jobs": J, "jobs": [{"job": id, "callsite": ...,
     "stages": [{"id": s, "name": ..., "tasks": n,
                 "shuffle_write_b": b, "shuffle_read_b": b,
                 "input_b": b}]}],
     "total_shuffle_write_b": B, "total_input_b": B}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dask_ssh_docker_spark.queries import REGISTRY
    from dask_ssh_docker_spark.session import get_session

    names = sys.argv[1:]
    unknown = [q for q in names if q not in REGISTRY]
    if unknown or not names:
        raise SystemExit(f"usage: job_inventory.py <query>...; unknown: {unknown}")

    evdir = tempfile.mkdtemp(prefix="spark-graft-ev-")
    spark = get_session(
        "spark-graft-inventory",
        conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    marks: dict[str, tuple[float, float]] = {}
    for name in names:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time() * 1000
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        marks[name] = (t0, time.time() * 1000)

    # flush the event log, then parse it (Spark 4 writes a rolling dir:
    # eventlog_v2_<appid>/events_N_<appid>)
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    app_id = sc.applicationId
    spark.stop()  # closes the in-progress log
    paths: list[str] = []
    for f in sorted(os.listdir(evdir)):
        p = os.path.join(evdir, f)
        if app_id not in f:
            continue
        if os.path.isdir(p):
            paths.extend(
                os.path.join(p, g)
                for g in sorted(os.listdir(p))
                if g.startswith("events_")
            )
        else:
            paths.append(p)

    def _lines():
        for p in paths:
            with open(p) as fh:
                yield from fh

    jobs = {}     # job id -> {submit_ms, callsite, stage_ids}
    stages = {}   # stage id -> {name, tasks, metrics}
    if True:
        for line in _lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "t": ev["Submission Time"],
                    "callsite": props.get("callSite.short", ""),
                    "desc": props.get("spark.job.description", ""),
                    "stage_ids": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "tasks": si["Number of Tasks"],
                    "shuffle_write_b": int(
                        acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0
                    ),
                    "shuffle_read_b": int(
                        acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0
                    ) + int(
                        acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0
                    ),
                    "input_b": int(
                        acc.get("internal.metrics.input.bytesRead", 0) or 0
                    ),
                }

    for name in names:
        t0, t1 = marks[name]
        qjobs = []
        for jid in sorted(jobs):
            j = jobs[jid]
            if not (t0 <= j["t"] <= t1):
                continue
            qjobs.append(
                {
                    "job": jid,
                    "callsite": j["callsite"],
                    "stages": [
                        {"id": s, **stages[s]} for s in sorted(j["stage_ids"])
                        if s in stages  # skipped stages have no completion
                    ],
                }
            )
        out = {
            "name": name,
            "n_jobs": len(qjobs),
            "jobs": qjobs,
            "total_shuffle_write_b": sum(
                st["shuffle_write_b"] for j in qjobs for st in j["stages"]
            ),
            "total_input_b": sum(
                st["input_b"] for j in qjobs for st in j["stages"]
            ),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
