"""Per-phase event-log profile of semantic_dedup_staged (VERDICT r8/r9
carried item): where do its ~6 wall-seconds at sf0.1 actually go —
staged-centroid assignment, block-pair cosine + edge build, CC
pointer-jumping rounds, or the final keep-one plan?

Phase attribution is by JOB: the pipeline's materialization points set
``spark.job.description`` (extensions/dedup.py — also visible in the
Spark UI at deployment), the profiler joins SparkListenerJobStart's
stage-id lists with TaskEnd durations, and every job without a label is
the caller's final action (keep-one + sizes over the checkpointed
labels). Output: per-phase stage/task counts, total task seconds, and
share of the run, written to the JSON artifact.

Usage: python tools/profile_semantic.py [sf_dir] [out_json] [query]
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
            if (
                '"SparkListenerTaskEnd"' in line
                or '"SparkListenerJobStart"' in line
            ):
                yield json.loads(line)


def _phase_of(desc: str | None) -> str:
    if not desc:
        return "final: keep-one + sizes + doc join"
    if desc.startswith("cc: seed"):
        return "cc seed (block-pair cosine + edges)"
    if desc.startswith("cc: round") and "convergence" in desc:
        return "cc convergence checks"
    if desc.startswith("cc: round"):
        return "cc pointer-jump rounds"
    return desc


def main() -> None:
    from timeseries_spark.queries import all_queries
    from timeseries_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "experiments/SEMDEDUP_PROFILE_r10.json"
    )
    qname = sys.argv[3] if len(sys.argv) > 3 else "semantic_dedup_staged"
    os.makedirs(EVT_DIR, exist_ok=True)
    spark = get_spark(
        "profile_semantic",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVT_DIR,
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    q = all_queries()[qname]
    q(spark, sf_dir).count()  # warm: staged artifacts, codegen, footers
    seen_jobs = {
        e["Job ID"]
        for e in _events(spark)
        if e["Event"] == "SparkListenerJobStart"
    }
    t0 = time.perf_counter()
    q(spark, sf_dir).count()
    wall = round(time.perf_counter() - t0, 3)

    stage_to_job: dict[int, int] = {}
    job_desc: dict[int, str | None] = {}
    stage_tasks: dict[int, list[float]] = {}
    for ev in _events(spark):
        if ev["Event"] == "SparkListenerJobStart":
            jid = ev["Job ID"]
            if jid in seen_jobs:
                continue
            job_desc[jid] = (ev.get("Properties") or {}).get(
                "spark.job.description"
            )
            for sid in ev.get("Stage IDs", []):
                stage_to_job[sid] = jid
        else:
            sid = ev.get("Stage ID", -1)
            if sid not in stage_to_job:
                continue
            info = ev.get("Task Info", {})
            stage_tasks.setdefault(sid, []).append(
                (info.get("Finish Time", 0) - info.get("Launch Time", 0))
                / 1e3
            )

    phases: dict[str, dict] = {}
    for sid, ts in stage_tasks.items():
        ph = _phase_of(job_desc.get(stage_to_job[sid]))
        agg = phases.setdefault(
            ph, {"stages": 0, "tasks": 0, "total_task_s": 0.0}
        )
        agg["stages"] += 1
        agg["tasks"] += len(ts)
        agg["total_task_s"] = round(agg["total_task_s"] + sum(ts), 3)
    n_rounds = len(
        {d for d in job_desc.values() if d and "hop+jump" in d}
    )
    total = sum(p["total_task_s"] for p in phases.values()) or 1.0
    for p in phases.values():
        p["share"] = round(p["total_task_s"] / total, 3)

    out = {
        "query": qname,
        "sf": sf_dir,
        "wall_s": wall,
        "cc_rounds": n_rounds,
        "task_time_total_s": round(total, 3),
        "phases": dict(
            sorted(phases.items(), key=lambda kv: -kv[1]["total_task_s"])
        ),
    }
    print(json.dumps(out, indent=1))
    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
