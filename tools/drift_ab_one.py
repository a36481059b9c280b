"""One arm of the r12-vs-current A/B drift comparison: run the three
untouched regressor queries bench-style (shared session, flagship
warmup, median of 3) against the repo tree given as argv[1], print one
JSON line. tools/drift_bisect.py killed the cache-leak theory; this
isolates TREE effect from BOX effect by letting the caller interleave
arms on the same machine (A B A B), each arm in a fresh process so
neither tree sees the other's JVM state.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

REPO = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, REPO)

VICTIMS = ("pagerank_parts_suppliers", "bigram_logprob", "pca_top_component")


def main() -> None:
    from timeseries_spark.queries import all_queries
    from timeseries_spark.session import get_spark

    spark = get_spark("drift-ab")
    registry = all_queries()
    registry["assoc_novelty_yearly"](spark, SF_DIR).count()

    def once(name: str) -> float:
        t0 = time.perf_counter()
        registry[name](spark, SF_DIR).count()
        return time.perf_counter() - t0

    out = {"repo": REPO}
    for v in VICTIMS:
        out[v] = round(statistics.median(once(v) for _ in range(3)), 3)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
