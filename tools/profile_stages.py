"""Generic per-stage event-log profile of one registry query at one or
more scale factors (round-13 item: name the dominant term behind
search_bm25_topk's 6.2x and token_cooccurrence_topk's 5.1x sf1/sf0.1
wall ratios — both sub-linear vs 10x data, but unexplained until now).

For each sf dir the query runs once warm (codegen, staged artifacts,
parquet footers) and once measured; stages of the measured run are
reported with task counts, summed task seconds, and the task-metric
volumes (input / shuffle-read / shuffle-write records and bytes) that
identify WHICH plan term a stage is — e.g. the postings build is the
stage whose shuffle-write records equal the corpus token count. Cross-sf
growth per matched stage (position in the task-time ranking) shows
whether the expensive term grows with the data (candidate-linear) or is
fixed overhead.

Usage: python tools/profile_stages.py <query> <out_json> <sf_dir> [sf_dir2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from skew_check import EVT_DIR  # noqa: E402


def _events(spark):
    app_id = spark.sparkContext.applicationId
    path = os.path.join(EVT_DIR, app_id + ".inprogress")
    if not os.path.exists(path):
        path = os.path.join(EVT_DIR, app_id)
    with open(path) as fh:
        for line in fh:
            if '"SparkListenerTaskEnd"' in line or (
                '"SparkListenerStageCompleted"' in line
            ):
                yield json.loads(line)


def _profile_run(spark, fn) -> dict:
    seen = {
        ev["Stage Info"]["Stage ID"]
        for ev in _events(spark)
        if ev["Event"] == "SparkListenerStageCompleted"
    }
    t0 = time.perf_counter()
    fn()
    wall = round(time.perf_counter() - t0, 3)
    stages: dict[int, dict] = {}
    names: dict[int, str] = {}
    for ev in _events(spark):
        if ev["Event"] == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            if si["Stage ID"] not in seen:
                names[si["Stage ID"]] = si.get("Stage Name", "?")
        elif ev["Event"] == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            if sid in seen:
                continue
            info = ev.get("Task Info", {})
            m = ev.get("Task Metrics") or {}
            s = stages.setdefault(
                sid,
                {
                    "tasks": 0,
                    "task_s": 0.0,
                    "input_records": 0,
                    "input_mb": 0.0,
                    "shuffle_read_records": 0,
                    "shuffle_write_records": 0,
                    "shuffle_write_mb": 0.0,
                },
            )
            s["tasks"] += 1
            s["task_s"] += (
                info.get("Finish Time", 0) - info.get("Launch Time", 0)
            ) / 1e3
            im = m.get("Input Metrics") or {}
            s["input_records"] += im.get("Records Read", 0)
            s["input_mb"] += im.get("Bytes Read", 0) / 1e6
            sr = m.get("Shuffle Read Metrics") or {}
            s["shuffle_read_records"] += sr.get("Total Records Read", 0)
            sw = m.get("Shuffle Write Metrics") or {}
            s["shuffle_write_records"] += sw.get("Shuffle Records Written", 0)
            s["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
    rows = []
    for sid, s in stages.items():
        rows.append(
            {
                "stage": sid,
                "name": names.get(sid, "?"),
                **{
                    k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in s.items()
                },
            }
        )
    rows.sort(key=lambda r: -r["task_s"])
    return {
        "wall_s": wall,
        "total_task_s": round(sum(r["task_s"] for r in rows), 3),
        "n_stages": len(rows),
        "stages_by_task_time": rows[:12],
    }


def main() -> None:
    from timeseries_spark.queries import all_queries
    from timeseries_spark.session import get_spark

    qname = sys.argv[1]
    out_json = sys.argv[2]
    sf_dirs = sys.argv[3:] or ["/root/testdata/sf0.1"]
    os.makedirs(EVT_DIR, exist_ok=True)
    spark = get_spark(
        "profile_stages",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVT_DIR,
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    q = all_queries()[qname]
    out = {"query": qname, "runs": {}}
    for sf in sf_dirs:
        q(spark, sf).count()  # warm
        out["runs"][sf] = _profile_run(spark, lambda: q(spark, sf).count())
    if len(sf_dirs) == 2:
        a, b = (out["runs"][d] for d in sf_dirs)
        out["wall_ratio"] = round(b["wall_s"] / a["wall_s"], 2)
        out["task_time_ratio"] = round(
            b["total_task_s"] / a["total_task_s"], 2
        )
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_json}")
    spark.stop()


if __name__ == "__main__":
    main()
