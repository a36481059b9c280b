"""Measure lever (b) at bench scale: flat broadcast-argmin assignment
vs the two-level routed path at a k large enough that the per-row O(k)
fold dominates (the regime that motivates routing — at extreme k the
flat path ALSO stops fitting in a broadcast, which local bench cannot
reproduce; the fold cost it CAN).

Fits one k=K quantizer on the sf1 embeddings, then times
assign_to_centroids (per row: fold over all K centroids) against
assign_to_centroids_routed (per row: fold over ~cell_target-sized
probed cells only), asserting row-identical output first.

Writes experiments/ROUTED_ASSIGN_r14.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
CELL_TARGET = int(sys.argv[3]) if len(sys.argv) > 3 else 64
# clustered mode: a float generates the in-memory mixture; "-" reads
# SF_DIR (use tools/make_clustered.py output for a PERSISTED clustered
# corpus — the r15 fixture)
SIGMA = (
    float(sys.argv[4])
    if len(sys.argv) > 4 and sys.argv[4] not in ("-", "none")
    else None
)
OUT = sys.argv[5] if len(sys.argv) > 5 else "experiments/ROUTED_ASSIGN_r14.json"


def main() -> None:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from timeseries_spark.extensions.kmeans import (
        assign_to_centroids,
        assign_to_centroids_routed,
        kmeans_fit,
    )
    from timeseries_spark.queries import load
    from timeseries_spark.session import get_spark

    from timeseries_spark.extensions.kmeans import build_centroid_router

    spark = get_spark("routed-bench")
    if SIGMA is not None:
        # clustered-geometry fixture (the prescreen_clustered mixture):
        # C Gaussian bumps on the unit sphere - the regime real text
        # embeddings live in, where triangle-inequality pruning bites;
        # the parquet corpus's near-uniform vectors concentrate all
        # pairwise distances and defeat ANY metric pruning (measured
        # below in the uniform entry)
        import numpy as np

        rng = np.random.default_rng(7)
        d_dim, n_pts, n_centers = 64, 20000, 64
        centers = rng.normal(size=(n_centers, d_dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = rng.integers(0, n_centers, size=n_pts)
        pts_np = centers[assign] + SIGMA * rng.normal(size=(n_pts, d_dim))
        emb = spark.createDataFrame(
            [(int(i), [float(x) for x in row]) for i, row in enumerate(pts_np)],
            "vec_id bigint, embedding array<double>",
        ).repartition(32).localCheckpoint(eager=True)
    else:
        emb = load(spark, SF_DIR, "embeddings")
    n = emb.count()
    # a REAL Lloyd fit at k=1024 costs ~1 min and is irrelevant to the
    # assignment cost being measured: the quantizer here is the first K
    # vectors relabeled as centroids (deterministic; routed-vs-flat
    # equality is still asserted, which is the exactness evidence)
    t0 = time.perf_counter()
    cents = (
        emb.orderBy("vec_id")
        .limit(K)
        .select(
            (F.row_number().over(W.orderBy("vec_id")) - 1).alias("cid"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "c"
            ),
        )
        .localCheckpoint(eager=True)
    )
    router = tuple(
        d.localCheckpoint(eager=True)
        for d in build_centroid_router(cents, cell_target=CELL_TARGET)
    )
    build_s = time.perf_counter() - t0

    flat = assign_to_centroids(emb, cents)
    routed = assign_to_centroids_routed(emb, cents, router=router)
    same = sorted(map(tuple, flat.collect())) == sorted(
        map(tuple, routed.collect())
    )

    def consume(df) -> None:
        # count() would let Catalyst PRUNE the argmin projection on the
        # flat (shuffle-free) path - the first cut of this bench timed a
        # bare scan at 0.25 s regardless of k. Aggregate over the output
        # columns so every distance fold actually evaluates.
        df.agg(
            F.sum(F.col("cluster").cast("bigint")), F.sum("sq_dist")
        ).collect()

    def med(df_fn) -> float:
        return round(
            statistics.median(
                (lambda: (t := time.perf_counter(), consume(df_fn()),
                          time.perf_counter() - t)[2])()
                for _ in range(3)
            ),
            3,
        )

    # pruning effectiveness: mean cells probed per vector (the routed
    # plan's cost driver - k_cells means no pruning at all)
    from timeseries_spark.extensions.kmeans import _sq_dist

    cells_df, router_arr = router
    n_cells = cells_df.select("cell").distinct().count()
    bounds = F.transform(
        F.col("cells"),
        lambda cell: F.struct(
            (F.sqrt(_sq_dist(F.col("v"), cell["rc"])) - cell["radius"]).alias("lb"),
            (F.sqrt(_sq_dist(F.col("v"), cell["rc"])) + cell["radius"]).alias("ub"),
        ),
    )
    mean_probed = (
        emb.select(
            F.col("vec_id").alias("vid"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
        )
        .crossJoin(F.broadcast(router_arr))
        .withColumn("__b", bounds)
        .withColumn("__u", F.array_min(F.transform(F.col("__b"), lambda b: b["ub"])))
        .select(
            F.size(
                F.filter(F.col("__b"), lambda b: b["lb"] <= F.col("__u") + F.lit(1e-4))
            ).alias("np_")
        )
        .agg(F.avg("np_"))
        .first()[0]
    )

    flat_s = med(lambda: assign_to_centroids(emb, cents))
    routed_s = med(
        lambda: assign_to_centroids_routed(emb, cents, router=router)
    )
    out = {
        "sf_dir": SF_DIR,
        "n_vectors": n,
        "k": K,
        "cell_target": CELL_TARGET,
        "router_build_s": round(build_s, 1),
        "n_cells": n_cells,
        "mean_cells_probed": round(mean_probed, 2),
        "sigma": SIGMA,
        "identical_output": same,
        "flat_assign_s": flat_s,
        "routed_probe_s": routed_s,
        "speedup": round(flat_s / routed_s, 2) if routed_s else None,
        "note": (
            "router prebuilt offline (build_centroid_router, the "
            "staged_centroids discipline) - the measured routed wall is "
            "the per-shard probe join only, the cost a production "
            "ingestion pass repeats; flat pays a per-row O(k) fold that "
            "grows with k while the probe pays O(probed cells x "
            "cell_target)"
        ),
    }
    os.makedirs("experiments", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
