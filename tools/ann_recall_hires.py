"""Recall of the hyperplane HIRES operating point on clustered
geometry (VERDICT r15 item 5).

ANN_RECALL_CLUSTERED_r15 measured single-bucket hyperplane recall@5
FALLING 0.625 -> 0.425 as planes go 3 -> 5 on the clustered fixture
(finer buckets, fewer candidates) but registered no query encoding the
multiprobe budget that buys the recall back. This study quotes the
recall of the now-registered ``ann_hyperplane_hires`` configuration
(5 planes, radius-2 multiprobe = 16 probes of 32 buckets) against the
brute-force ground truth, alongside the single-bucket and radius-1
points at the same plane counts, plus the mean probed-candidate count
per query (the cost axis recall is traded against).

Usage: python tools/ann_recall_hires.py [fixture_dir] [out_json]
Fixture: tools/make_clustered.py output (default /tmp/testdata_clustered).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_clustered"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "experiments/ANN_RECALL_HIRES_r16.json"
    )
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from timeseries_spark.extensions.similarity import (
        brute_force_topk,
        hyperplane_lsh_topk,
    )

    emb = spark.read.parquet(f"{fixture}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, qs, k=5).collect()
    }
    n_truth = len(truth)

    def recall_and_cost(n_planes, multiprobe, radius):
        got = hyperplane_lsh_topk(
            emb, qs, k=5, n_planes=n_planes, dims=64,
            multiprobe=multiprobe, probe_radius=radius,
        )
        hits = {
            (r["query_id"], r["neighbor_id"]) for r in got.collect()
        }
        # candidate cost: corpus rows landing in the probed buckets
        # (what the exact-cosine stage actually scores)
        from timeseries_spark.extensions.similarity import (
            hyperplane_bucket,
            rademacher_planes,
        )

        planes = rademacher_planes(n_planes, 64)
        corpus_b = emb.select(
            F.col("vec_id"),
            hyperplane_bucket("embedding", planes).alias("bucket"),
        )
        q_b = qs.select(
            "query_id",
            hyperplane_bucket("query_vec", planes).alias("bucket"),
        )
        if multiprobe:
            masks = [0] + [1 << p for p in range(n_planes)]
            if radius == 2:
                masks += [
                    (1 << p) | (1 << r)
                    for p in range(n_planes)
                    for r in range(p + 1, n_planes)
                ]
            q_b = q_b.withColumn(
                "bucket",
                F.explode(
                    F.array(
                        *[
                            F.col("bucket").bitwiseXOR(F.lit(m))
                            for m in masks
                        ]
                    )
                ),
            )
        n_cand = (
            q_b.join(corpus_b, "bucket")
            .groupBy("query_id")
            .count()
            .agg(F.avg("count"))
            .collect()[0][0]
        )
        return {
            "n_planes": n_planes,
            "multiprobe": multiprobe,
            "probe_radius": radius if multiprobe else 0,
            "recall_at_5": round(len(hits & truth) / n_truth, 4),
            "mean_candidates_per_query": round(float(n_cand or 0.0), 1),
        }

    points = [
        recall_and_cost(3, False, 1),
        recall_and_cost(4, False, 1),
        recall_and_cost(5, False, 1),
        recall_and_cost(4, True, 1),   # the registered multiprobe query
        recall_and_cost(5, True, 1),
        recall_and_cost(5, True, 2),   # ann_hyperplane_hires
    ]
    out = {
        "question": (
            "VERDICT r15 item 5: does the radius-2 multiprobe budget at "
            "5 planes (the registered ann_hyperplane_hires operating "
            "point) restore the recall the finer bucketing loses on "
            "clustered geometry?"
        ),
        "fixture": fixture,
        "n_queries": 8,
        "points": points,
        "registered_query": "ann_hyperplane_hires (5 planes, radius-2, "
        "16 probes of 32 buckets)",
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
