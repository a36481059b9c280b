"""Bisect the ~16% fleet-wide sf0.1 drift between BENCH_r12 and r13.

Hypothesis (VERDICT r13 'Next round' #2): the round-13 session-lifetime
persist()/localCheckpoint additions in the dedup family leak cache
entries across the bench's single shared session — every REP of a
cache-creating query registers a fresh InMemoryRelation / checkpointed
RDD, so by the time the untouched late-order queries run
(pagerank_parts_suppliers idx 20, bigram_logprob idx 26,
pca_top_component idx 31) the executors carry dozens of dead blocks and
pay GC/eviction overhead the r12 tree never saw.

Design: one session, three phases, interleaved to null out box drift —

  A. baseline: victims timed on a quiet session (median of reps);
  B. polluted: run the cache-creating HEADLINE prefix (dedup_minhash_lsh,
     semantic_dedup, corpus_prepare, semantic_dedup_staged) x reps
     exactly as bench.py does, then time the victims again;
  C. released: release_dedup_caches() + clear tracked JVM cache blocks,
     then time the victims a third time.

If B >> A ~= C, the drift is the cache leak and the fix is a
release point between bench queries (bench.py) plus the registered
lifecycle (extensions/dedup.py:release_dedup_caches). If B ~= A, the
leak theory dies here and the artifact says so.

Writes experiments/DRIFT_BISECT_r14.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VICTIMS = ("pagerank_parts_suppliers", "bigram_logprob", "pca_top_component")
POLLUTERS = (
    "dedup_minhash_lsh",
    "semantic_dedup",
    "corpus_prepare",
    "semantic_dedup_staged",
)
REPS = 3


def main() -> None:
    from timeseries_spark.extensions.dedup import release_dedup_caches
    from timeseries_spark.queries import all_queries
    from timeseries_spark.session import get_spark

    spark = get_spark("drift-bisect")
    sc = spark.sparkContext
    registry = all_queries()

    def time_once(name: str) -> float:
        t0 = time.perf_counter()
        registry[name](spark, SF_DIR).count()
        return time.perf_counter() - t0

    def time_victims() -> dict[str, float]:
        return {
            v: round(statistics.median(time_once(v) for _ in range(REPS)), 3)
            for v in VICTIMS
        }

    def n_cached_rdds() -> int:
        return sc._jsc.sc().getPersistentRDDs().size()

    # warm (mirrors bench.py's off-the-clock flagship warmup)
    registry["assoc_novelty_yearly"](spark, SF_DIR).count()

    out: dict[str, object] = {"sf_dir": SF_DIR, "reps": REPS}
    out["phaseA_quiet"] = time_victims()
    out["cached_rdds_after_A"] = n_cached_rdds()

    for name in POLLUTERS:
        for _ in range(REPS):
            time_once(name)
    out["cached_rdds_after_pollute"] = n_cached_rdds()
    out["phaseB_polluted"] = time_victims()

    released = release_dedup_caches()
    # kmeans/staged localCheckpoint blocks are not registry-tracked;
    # drop every remaining persistent RDD so phase C measures a truly
    # quiet session (bench cannot do this blanket drop mid-run — a
    # live localCheckpoint may still back an un-run plan — but the
    # bisect can, because nothing here is consumed afterwards)
    jmap = sc._jsc.sc().getPersistentRDDs()
    it = jmap.toList().iterator()
    dropped = 0
    while it.hasNext():
        it.next()._2().unpersist(False)
        dropped += 1
    out["release_registered"] = released
    out["release_unregistered_rdds"] = dropped
    out["cached_rdds_after_release"] = n_cached_rdds()
    out["phaseC_released"] = time_victims()

    a, b, c = (
        sum(out["phaseA_quiet"].values()),
        sum(out["phaseB_polluted"].values()),
        sum(out["phaseC_released"].values()),
    )
    out["totals"] = {"A_quiet": round(a, 3), "B_polluted": round(b, 3),
                     "C_released": round(c, 3)}
    out["verdict"] = (
        "cache-leak confirmed: polluted >> quiet ~= released"
        if b > 1.15 * a and c < 0.5 * (a + b)
        else "cache-leak NOT confirmed at these magnitudes"
    )
    os.makedirs("experiments", exist_ok=True)
    with open("experiments/DRIFT_BISECT_r14.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
