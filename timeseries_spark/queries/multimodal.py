"""Multimodal plumbing queries (extension surface).

``media_decode_stats`` exercises the full binary-column pipeline —
synthesize payloads → Arrow-batched mapInPandas decode → resize planning →
aggregate. The decode step itself is Python (mapInPandas), so there is no
faithful ANSI-SQL oracle; the mean_byte/n_bytes math IS reproducible in
SQL, so we oracle-check those through DuckDB string/byte functions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.extensions.multimodal import (
    decode_media,
    resize_plan,
    synthetic_media,
)
from timeseries_spark.queries import load, query


@query(
    "media_decode_stats",
    oracle="""
    SELECT kind,
           count(*) AS n_media,
           CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_bytes,
           round(avg((doc_id % 64 + 16)), 4) AS avg_width,
           round(avg(
             greatest(round((doc_id % 48 + 16) * least(1.0,
               32.0 / greatest(doc_id % 64 + 16, doc_id % 48 + 16))), 1)
           ), 4) AS avg_target_height
    FROM (SELECT doc_id, text, 'image' AS kind FROM documents)
    GROUP BY kind
    """,
)
def media_decode_stats(spark, sf_dir):
    """Binary media columns end-to-end: synthetic payloads, mapInPandas
    decode (fake codec), resize planning, rollup. The documents text is
    ASCII, so payload byte length == char length, which the oracle checks."""
    docs = load(spark, sf_dir, "documents")
    media = synthetic_media(docs)
    decoded = decode_media(media, fake=True)
    planned = resize_plan(decoded, max_side=32)
    return (
        planned.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("target_height"), 4).alias("avg_target_height"),
        )
    )
