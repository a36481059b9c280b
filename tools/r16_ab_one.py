"""One-query fresh-process timer for interleaved A/B runs (guide §1.1
empirical loop; the SEMDEDUP_AB_r15 shape). Times plan build + count()
exactly like bench.py, N reps in one fresh session, prints one JSON
line with all reps so the caller can interleave processes and compare
medians.

Usage: python tools/r16_ab_one.py <query> [reps=3] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    from timeseries_spark.queries import all_queries
    from timeseries_spark.session import get_spark

    spark = get_spark("r16_ab_one")
    registry = all_queries()
    # same steady-state warmup as bench.py
    registry["assoc_novelty_yearly"](spark, sf_dir).count()
    fn = registry[name]
    fn(spark, sf_dir).count()  # warm the query's own path
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"query": name, "sf": sf_dir, "reps": times}))


if __name__ == "__main__":
    main()
