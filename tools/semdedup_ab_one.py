"""One arm of the r13-vs-r15 semantic_dedup_scaled A/B (VERDICT r15
item 2: BENCH_r13 6.418 s -> BENCH_r14 8.275 s at sf0.1 with no
artifact explaining it). Runs the auto-k pair bench-style — shared
session, flagship warmup, median of 3 — against the repo tree given
as argv[1] and prints one JSON line. The caller interleaves arms
(A B A B ...) on the same machine, each arm a fresh process, so tree
effect separates from box effect exactly as DRIFT_AB_r14 did for the
r12 fleet drift.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

REPO = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, REPO)

VICTIMS = ("semantic_dedup_scaled", "semantic_dedup_scaled_staged")


def main() -> None:
    from timeseries_spark.queries import all_queries
    from timeseries_spark.session import get_spark

    spark = get_spark("semdedup-ab")
    registry = all_queries()
    registry["assoc_novelty_yearly"](spark, SF_DIR).count()  # warmup

    def once(name: str) -> float:
        t0 = time.perf_counter()
        registry[name](spark, SF_DIR).count()
        return time.perf_counter() - t0

    out = {"repo": REPO}
    for v in VICTIMS:
        reps = [once(v) for _ in range(3)]
        out[v] = round(statistics.median(reps), 3)
        out[v + "_reps"] = [round(r, 3) for r in reps]
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
