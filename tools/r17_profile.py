"""Round-17 measurement harness (guide §1: measure first).

For every HEADLINE query: one warm run, then a measured run timed the
same way bench.py times it (plan build + .count()), with per-run job /
stage / task counts and task-metric volumes pulled from the event log —
the numbers that separate "wall is data" (task seconds track bytes)
from "wall is orchestration" (dozens of tiny jobs, task seconds <<
wall). Also dumps .explain('formatted') for each query's returned plan
to plans/r17/<query>_<tag>.txt so plan-shape claims are checkable.

Usage: python tools/r17_profile.py <out_json> [tag=before] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

EVT_DIR = "/tmp/spark-events-r17"


def _events(spark):
    app_id = spark.sparkContext.applicationId
    path = os.path.join(EVT_DIR, app_id + ".inprogress")
    if not os.path.exists(path):
        path = os.path.join(EVT_DIR, app_id)
    with open(path) as fh:
        for line in fh:
            if (
                '"SparkListenerTaskEnd"' in line
                or '"SparkListenerJobStart"' in line
                or '"SparkListenerStageCompleted"' in line
            ):
                yield json.loads(line)


def _snapshot(spark):
    jobs, stages, tasks = set(), set(), 0
    task_ms = 0
    sh_read = sh_write = inp = 0
    for ev in _events(spark):
        if ev["Event"] == "SparkListenerJobStart":
            jobs.add(ev["Job ID"])
        elif ev["Event"] == "SparkListenerStageCompleted":
            stages.add(ev["Stage Info"]["Stage ID"])
        elif ev["Event"] == "SparkListenerTaskEnd":
            tasks += 1
            ti = ev.get("Task Info", {})
            task_ms += ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            tm = ev.get("Task Metrics") or {}
            sh_read += (tm.get("Shuffle Read Metrics") or {}).get(
                "Remote Bytes Read", 0
            ) + (tm.get("Shuffle Read Metrics") or {}).get(
                "Local Bytes Read", 0
            )
            sh_write += (tm.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0
            )
            inp += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
    return {
        "jobs": len(jobs),
        "stages": len(stages),
        "tasks": tasks,
        "task_sec": round(task_ms / 1000.0, 2),
        "shuffle_read_mb": round(sh_read / 1e6, 2),
        "shuffle_write_mb": round(sh_write / 1e6, 2),
        "input_mb": round(inp / 1e6, 2),
    }


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "experiments/R17_PROFILE.json"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    os.makedirs(EVT_DIR, exist_ok=True)
    os.makedirs("/root/repo/plans/r17", exist_ok=True)

    from bench import HEADLINE
    from timeseries_spark.queries import all_queries
    from timeseries_spark.session import get_spark

    spark = get_spark(
        "r17_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVT_DIR,
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = all_queries()
    wanted = sys.argv[3:] or [n for n in HEADLINE if n in registry]

    # same steady-state warmup as bench.py
    registry["assoc_novelty_yearly"](spark, sf_dir).count()

    results: dict[str, dict] = {}
    for name in wanted:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"{name}: warm")
        fn(spark, sf_dir).count()
        base = _snapshot(spark)
        spark.sparkContext.setJobDescription(f"{name}: measured")
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = round(time.perf_counter() - t0, 3)
        time.sleep(0.3)  # let the event log flush
        cur = _snapshot(spark)
        delta = {
            k: round(cur[k] - base[k], 2) for k in cur
        }
        results[name] = {"wall": wall, **delta}
        # plan dump of the returned DataFrame (interior eager jobs run
        # again here; that is the price of a fresh plan object)
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"/root/repo/plans/r17/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        print(json.dumps({name: results[name]}), flush=True)
    spark.sparkContext.setJobDescription(None)

    with open(out_json, "w") as f:
        json.dump({"sf_dir": sf_dir, "tag": tag, "queries": results}, f, indent=1)


if __name__ == "__main__":
    main()
