"""Isolate the sampled-Lloyd lever's fit-side saving at forced scale
(VERDICT r15 item 6 evidence).

At bench scale the lever is invisible end-to-end: semantic_dedup_
sampled == semantic_dedup_scaled within noise at sf1 (13.6 vs 13.5 s)
because with n=20k, k=40 the Lloyd fit is a few-percent share of the
pipeline — pair generation (n·512 cosine folds) and the component
closure dominate. The fit term the lever cuts is n·k·dims·rounds,
which only matters when k grows with n (the auto-k contract). This
bench forces that regime: replicate the sf1 embeddings R× with
shifted ids (n=200k, auto-k=391) and time the FIT STAGE alone —
exact kmeans_fit(all) vs kmeans_fit(1/8 hash sample) +
assign_to_centroids(all) — the two quantizer-production paths whose
outputs feed identical blocking.

Usage: python tools/sampled_fit_bench.py [sf1_dir] [R] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OUT = sys.argv[3] if len(sys.argv) > 3 else "experiments/SEMDEDUP_SAMPLED_r15.json"


def main() -> None:
    from pyspark.sql import functions as F

    from timeseries_spark.extensions.dedup import auto_n_clusters
    from timeseries_spark.extensions.hashing import md5_long
    from timeseries_spark.extensions.kmeans import (
        assign_to_centroids,
        kmeans_fit,
    )
    from timeseries_spark.queries import load
    from timeseries_spark.session import get_spark

    spark = get_spark("sampled-fit-bench")
    base = load(spark, SF_DIR, "embeddings")
    rep = spark.range(R).select(F.col("id").alias("r"))
    emb = (
        base.crossJoin(rep)
        .select(
            (F.col("vec_id") + F.col("r") * 10_000_000).alias("vec_id"),
            "embedding",
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    n = emb.count()
    k = auto_n_clusters(n, target_block_size=512)
    sample = emb.filter(
        md5_long(
            F.concat(F.lit("ksample:"), F.col("vec_id").cast("string"))
        )
        % 8
        == 0
    )
    m = sample.count()

    def consume(df) -> int:
        return df.count()

    t0 = time.perf_counter()
    a_exact, _ = kmeans_fit(emb, k=k, max_iter=3)
    consume(a_exact)
    exact_s = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    _, cents = kmeans_fit(sample, k=k, max_iter=3)
    a_sampled = assign_to_centroids(emb, cents).localCheckpoint(eager=True)
    consume(a_sampled)
    sampled_s = round(time.perf_counter() - t0, 2)

    out = {
        "sf_dir": SF_DIR,
        "replicas": R,
        "n_vectors": n,
        "sample_n": m,
        "k_auto": k,
        "exact_fit_s": exact_s,
        "sampled_fit_plus_assign_all_s": sampled_s,
        "fit_side_speedup": round(exact_s / sampled_s, 2),
        "bench_scale_context": (
            "end-to-end at sf1 (n=20k, k=40) the pipelines tie "
            "(BENCH_SF1_r15: sampled 13.62 s vs exact 13.52 s) because "
            "pair generation dominates; this bench forces the auto-k "
            "regime (k grows with n) where the fit term the lever cuts "
            "is the dominant quantizer-production cost"
        ),
        "fold_accounting": {
            "exact": f"{n}x{k}x3 rounds = {n * k * 3:,} distance folds",
            "sampled": (
                f"{m}x{k}x3 + {n}x{k} assign = {m * k * 3 + n * k:,} folds"
            ),
        },
    }
    json.dump(out, open(OUT, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
