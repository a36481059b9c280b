"""Multi-SESSION point-query serving (round-11/13 carried item): K
independent Spark driver PROCESSES serving point reads off the SAME
staged association artifacts — the deployment shape where several
notebook/dashboard users share one precomputed stage directory, which
is exactly what the atomic rename-publish in extensions/staging.py
exists for.

Two phases per session count K in {1, 2, 4}:

- cold race: all K sessions start with the stage dir EMPTY and race to
  materialize the same artifacts concurrently — multi-process proof of
  the rename-publish protocol (losers adopt the winner's artifact, a
  reader never sees a partial), plus each session's first-serve cost.
- warm serve: the artifacts exist; each session issues ``n_req`` point
  reads from its own driver and reports per-request latency. The
  parent aggregates p50/p99 per session count — the sizing curve.

Each child runs local[8] (a fixed fair share of the 32-core box for
every K, so the curve isolates shared-artifact/IO effects instead of
CPU oversubscription; on a real cluster each session has its own
executors). Results must also AGREE row-for-row across sessions —
asserted via a per-session result digest.

Usage: python tools/multi_session_point.py [sf_dir] [n_req] [out]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, hashlib
sys.path.insert(0, %(repo)r)
from timeseries_spark.plans.pipeline import point_query
from timeseries_spark.queries.domain import _staged_assoc_tables
from timeseries_spark.session import get_spark

sf_dir, n_req, out_path, tag = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
spark = get_spark("point_sess_" + tag, master="local[8]", shuffle_partitions=8)
t0 = time.perf_counter()
overall, by_ds = _staged_assoc_tables(spark, sf_dir)
stage_s = time.perf_counter() - t0
pairs = [
    (r["diseaseId"], r["targetId"])
    for r in overall.select("diseaseId", "targetId")
    .distinct().orderBy("diseaseId", "targetId").collect()
]
keys = [pairs[i %% len(pairs)] for i in range(n_req)]
lat, digest = [], hashlib.sha256()
rows0 = point_query(overall, by_ds, *keys[0]).collect()  # warm codegen
t_wall = time.perf_counter()
for d, t in keys:
    t1 = time.perf_counter()
    rows = point_query(overall, by_ds, d, t).collect()
    lat.append(time.perf_counter() - t1)
    for row in sorted(map(tuple, rows), key=repr):
        digest.update(repr(row).encode())
json.dump({
    "tag": tag, "stage_s": round(stage_s, 2),
    "wall_s": round(time.perf_counter() - t_wall, 2),
    "lat": [round(x, 4) for x in lat],
    "digest": digest.hexdigest()[:16],
}, open(out_path, "w"))
"""


def _run_children(k: int, sf_dir: str, n_req: int, tmp: str) -> list[dict]:
    script = os.path.join(tmp, "child.py")
    with open(script, "w") as f:
        f.write(CHILD % {"repo": REPO})
    procs = []
    for i in range(k):
        out = os.path.join(tmp, f"out_{k}_{i}.json")
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, script, sf_dir, str(n_req), out, f"{k}_{i}"],
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                ),
                out,
            )
        )
    results = []
    for p, out in procs:
        rc = p.wait(timeout=900)
        if rc != 0 or not os.path.exists(out):
            raise RuntimeError(f"child failed rc={rc} for {out}")
        results.append(json.load(open(out)))
    return results


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "experiments/POINT_MULTISESSION_r13.json"
    )
    out: dict = {"sf": sf_dir, "n_req_per_session": n_req, "sessions": {}}
    tmp = tempfile.mkdtemp(prefix="multisess_")
    stage = os.path.join(tmp, "stage")
    os.environ["SPARK_GRAFT_STAGE_DIR"] = stage
    try:
        for k in (1, 2, 4):
            # cold race: empty stage dir, K sessions racing the publish
            shutil.rmtree(stage, ignore_errors=True)
            t0 = time.perf_counter()
            cold = _run_children(k, sf_dir, 2, tmp)
            cold_wall = round(time.perf_counter() - t0, 2)
            # warm serve: artifacts on disk, K sessions serving n_req each
            t0 = time.perf_counter()
            warm = _run_children(k, sf_dir, n_req, tmp)
            warm_wall = round(time.perf_counter() - t0, 2)
            lat = sorted(x for r in warm for x in r["lat"])
            q = lambda p: round(  # noqa: E731
                lat[min(len(lat) - 1, int(p * len(lat)))], 3
            )
            # digests hash the per-request result rows, so they are
            # comparable only within a same-request-set group
            digests_ok = (
                len({r["digest"] for r in cold}) == 1
                and len({r["digest"] for r in warm}) == 1
            )
            out["sessions"][f"k{k}"] = {
                "cold_race_wall_s": cold_wall,
                "cold_stage_build_s": [r["stage_s"] for r in cold],
                "warm_wall_s": warm_wall,
                "warm_stage_read_s": [r["stage_s"] for r in warm],
                "throughput_qps_total": round(k * n_req / warm_wall, 1),
                "latency_s": {
                    "p50": q(0.50),
                    "p95": q(0.95),
                    "p99": q(0.99),
                    "mean": round(statistics.mean(lat), 3),
                },
                "digests_agree": digests_ok,
            }
            print(k, "->", json.dumps(out["sessions"][f"k{k}"]), flush=True)
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {out_json}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
