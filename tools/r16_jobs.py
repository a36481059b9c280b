"""Per-job decomposition of ONE query in a fresh process: wall, then
each Spark job's description, stage count, task count and task-seconds
from the event log — the tool that separates "which phase got slower"
from wall noise (guide §1.1 empirical loop).

Usage: python tools/r16_jobs.py <query> [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

EVT_DIR = "/tmp/spark-events-r16"


def main() -> None:
    name = sys.argv[1]
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    out = sys.argv[3] if len(sys.argv) > 3 else None
    os.makedirs(EVT_DIR, exist_ok=True)

    from timeseries_spark.queries import all_queries
    from timeseries_spark.session import get_spark

    spark = get_spark(
        "r16_jobs",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVT_DIR,
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    registry = all_queries()
    registry["assoc_novelty_yearly"](spark, sf_dir).count()
    registry[name](spark, sf_dir).count()  # warm

    app_id = spark.sparkContext.applicationId
    path = os.path.join(EVT_DIR, app_id + ".inprogress")

    def _pos() -> int:
        return os.path.getsize(path) if os.path.exists(path) else 0

    start = _pos()
    t0 = time.perf_counter()
    registry[name](spark, sf_dir).count()
    wall = round(time.perf_counter() - t0, 3)
    time.sleep(0.5)

    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    with open(path) as fh:
        fh.seek(start)
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = {
                    "desc": desc[:80],
                    "stages": 0,
                    "tasks": 0,
                    "task_sec": 0.0,
                }
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                jid = stage_to_job.get(si["Stage ID"])
                if jid in jobs:
                    jobs[jid]["stages"] += 1
                    jobs[jid]["n_parts_last"] = si.get("Number of Tasks")
                    jobs[jid].setdefault("stage_names", []).append(
                        f"s{si['Stage ID']}:{si.get('Stage Name','')[:60]}"
                    )
            elif e == "SparkListenerTaskEnd":
                jid = stage_to_job.get(ev["Stage ID"])
                if jid in jobs:
                    ti = ev.get("Task Info", {})
                    jobs[jid]["tasks"] += 1
                    jobs[jid]["task_sec"] += (
                        ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                    ) / 1000.0
                    tm = ev.get("Task Metrics") or {}
                    jobs[jid]["cpu_sec"] = jobs[jid].get("cpu_sec", 0.0) + (
                        tm.get("Executor CPU Time", 0) / 1e9
                    )
                    jobs[jid]["gc_sec"] = jobs[jid].get("gc_sec", 0.0) + (
                        tm.get("JVM GC Time", 0) / 1000.0
                    )
                    jobs[jid]["deser_sec"] = jobs[jid].get(
                        "deser_sec", 0.0
                    ) + (tm.get("Executor Deserialize Time", 0) / 1000.0)
                    jobs[jid]["input_mb"] = jobs[jid].get("input_mb", 0.0) + (
                        (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
                        / 1e6
                    )
    total_ts = round(sum(j["task_sec"] for j in jobs.values()), 2)
    rows = [
        {"job": jid, **{k: (round(v, 2) if isinstance(v, float) else v)
                        for k, v in j.items()}}
        for jid, j in sorted(jobs.items())
    ]
    res = {
        "query": name,
        "sf": sf_dir,
        "wall": wall,
        "task_sec_total": total_ts,
        "n_jobs": len(rows),
        "jobs": rows,
    }
    print(json.dumps(res, indent=1))
    if out:
        with open(out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
