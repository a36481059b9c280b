"""Multimodal queries (extension surface) — REAL codecs, oracle-gated.

``media_decode_stats`` runs genuine pure-numpy decoders (PPM P6 / 24-bit
BMP / RIFF PCM16 WAV) over binary payload columns via Arrow-batched
``mapInPandas``. The fixture payloads are real bytes in those formats,
generated deterministically from doc_id arithmetic (extensions/
multimodal.py real_media), so a pure-SQL oracle can replay every decoded
dimension, byte count, and mean pixel/sample value exactly — including
the corrupt rows (valid header, half the body), which must survive as
error rows with the decoder's message, never fail the job.

The mean/histogram replays sum the generator's byte pattern
``(seed + i) % m`` with ``generate_series`` — exact integer sums, so the
double division matches bit for bit across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseries_spark.extensions.multimodal import (
    decode_media,
    extract_features,
    real_media,
    resize_plan,
)
from timeseries_spark.queries import load, query

# shared arithmetic of the fixture generator, replayed in SQL
_M = """
    SELECT doc_id AS media_id, doc_id % 3 AS k, (doc_id % 97 = 0) AS corrupt,
           doc_id % 64 + 16 AS pw, doc_id % 48 + 16 AS ph,
           doc_id % 32 + 8 AS bw, doc_id % 24 + 8 AS bh,
           doc_id % 400 + 100 AS ns,
           doc_id % 251 AS ps, doc_id % 512 AS ws
    FROM documents
"""

# exact mean of the pattern (seed + i) % modulus (shifted by `shift`)
# over n values: integer list_sum, then one double division
def _mean_sql(seed: str, n: str, modulus: int, shift: int = 0) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(0, ({n}) - 1), "
        f"i -> ({seed} + i) % {modulus} - {shift})) AS DOUBLE) / ({n})"
    )


def _decode_oracle() -> str:
    ppm_n = "pw * ph * 3"
    bmp_n = "bw * bh * 3"
    bmp_body = "((bw * 3 + 3) // 4 * 4) * bh"
    return f"""
    WITH m AS ({_M})
    SELECT media_id,
           CASE WHEN k = 2 THEN 'audio' ELSE 'image' END AS kind,
           CASE WHEN corrupt THEN NULL WHEN k = 0 THEN 'ppm'
                WHEN k = 1 THEN 'bmp' ELSE 'wav' END AS format,
           CAST(CASE WHEN corrupt OR k = 2 THEN NULL
                WHEN k = 0 THEN pw ELSE bw END AS INT) AS width,
           CAST(CASE WHEN corrupt OR k = 2 THEN NULL
                WHEN k = 0 THEN ph ELSE bh END AS INT) AS height,
           CAST(CASE WHEN corrupt THEN NULL
                WHEN k = 2 THEN 1 ELSE 3 END AS INT) AS channels,
           CAST(CASE WHEN corrupt OR k < 2 THEN NULL
                ELSE 8000 END AS INT) AS sample_rate,
           CAST(CASE WHEN corrupt THEN NULL WHEN k = 0 THEN pw * ph
                WHEN k = 1 THEN bw * bh ELSE ns END AS BIGINT) AS n_samples,
           CAST(CASE WHEN corrupt THEN NULL WHEN k = 0 THEN {ppm_n}
                WHEN k = 1 THEN {bmp_n} ELSE 2 * ns END AS BIGINT) AS n_bytes,
           CASE WHEN corrupt THEN NULL
                WHEN k = 0 THEN {_mean_sql("ps", ppm_n, 256)}
                WHEN k = 1 THEN {_mean_sql("ps", bmp_n, 256)}
                ELSE {_mean_sql("ws", "ns", 512, 256)} END AS mean_val,
           CASE WHEN NOT corrupt THEN NULL
                WHEN k = 0 THEN 'ppm: truncated body: expected '
                  || CAST({ppm_n} AS VARCHAR) || ' bytes, got '
                  || CAST(({ppm_n}) // 2 AS VARCHAR)
                WHEN k = 1 THEN 'bmp: truncated body: expected '
                  || CAST({bmp_body} AS VARCHAR) || ' bytes, got '
                  || CAST(({bmp_body}) // 2 AS VARCHAR)
                ELSE 'wav: truncated data: expected '
                  || CAST(2 * ns AS VARCHAR) || ' bytes, got '
                  || CAST(ns AS VARCHAR) END AS error
    FROM m
    """


@query("media_decode_stats", oracle=_decode_oracle())
def media_decode_stats(spark, sf_dir):
    """REAL multimodal decode end-to-end: deterministic PPM/BMP/WAV
    payloads (actual format bytes) -> Arrow-batched mapInPandas running
    the pure-numpy codecs -> per-row decoded stats. Corrupt payloads
    (every 97th doc: valid header, half the body) survive as error rows
    carrying the decoder's message. The oracle replays every decoded
    dimension, byte count, and exact mean pixel/sample value from the
    generator arithmetic — the decode is checked against real bytes, not
    a stub."""
    docs = load(spark, sf_dir, "documents")
    return decode_media(real_media(docs))


def _hist_sql(seed: str, n: str, modulus: int, n_bins: int) -> str:
    """Exact bin counts of the pattern (seed + i) % modulus over n
    values, bin width modulus/n_bins: full cycles contribute equally,
    the partial window [0, n % modulus) covers residue r iff
    ((r - seed) mod modulus) < n % modulus."""
    width = modulus // n_bins
    return (
        f"list_transform(generate_series(0, {n_bins - 1}), b -> "
        f"CAST(({n}) // {modulus} * {width} + "
        f"list_sum(list_transform(generate_series(b * {width}, "
        f"b * {width} + {width - 1}), "
        f"r -> CASE WHEN (r - ({seed}) + {modulus}) % {modulus} "
        f"< ({n}) % {modulus} THEN 1 ELSE 0 END)) AS DOUBLE) / ({n}))"
    )


def _features_oracle() -> str:
    return f"""
    WITH m AS ({_M})
    SELECT media_id,
           CASE WHEN k = 2 THEN 'audio' ELSE 'image' END AS kind,
           CASE WHEN corrupt THEN NULL
                WHEN k = 0 THEN {_hist_sql("ps", "pw * ph * 3", 256, 16)}
                WHEN k = 1 THEN {_hist_sql("ps", "bw * bh * 3", 256, 16)}
                ELSE {_hist_sql("ws", "ns", 512, 16)} END AS feature
    FROM m
    """


@query("media_feature_hist", oracle=_features_oracle())
def media_feature_hist(spark, sf_dir):
    """Content embeddings from REAL decoded media: 16-bin L1-normalized
    histogram of the decoded pixel bytes (images) / int16 samples mapped
    onto the byte scale (audio) — the array<double> shape the ANN and
    embedding-dedup operators consume. Corrupt rows emit a NULL feature.
    The oracle reconstructs every bin count exactly from the generator
    pattern (full cycles + partial-window residue test)."""
    docs = load(spark, sf_dir, "documents")
    return extract_features(real_media(docs), n_bins=16)


def _resize_oracle() -> str:
    tw = (
        "CAST(greatest(round({w} * least(1.0, 32.0 / greatest({w}, {h}))), 1)"
        " AS INT)"
    )
    return f"""
    WITH m AS ({_M}),
    decoded AS (
      SELECT CASE WHEN k = 2 THEN 'audio' ELSE 'image' END AS kind,
             CASE WHEN corrupt THEN NULL WHEN k = 0 THEN 'ppm'
                  WHEN k = 1 THEN 'bmp' ELSE 'wav' END AS format,
             CASE WHEN corrupt OR k = 2 THEN NULL
                  WHEN k = 0 THEN pw ELSE bw END AS width,
             CASE WHEN corrupt OR k = 2 THEN NULL
                  WHEN k = 0 THEN ph ELSE bh END AS height,
             corrupt
      FROM m
    )
    SELECT kind, format,
           CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
             AS n_errors,
           round(avg({tw.format(w="width", h="height")}), 4)
             AS avg_target_width,
           round(avg({tw.format(w="height", h="width")}), 4)
             AS avg_target_height
    FROM decoded
    GROUP BY kind, format
    """


@query("media_resize_rollup", oracle=_resize_oracle())
def media_resize_rollup(spark, sf_dir):
    """Decode -> resize-plan -> rollup over real media: per (kind,
    format) counts, error counts, and average aspect-preserving target
    dims (max side 32). Error rows group under a NULL format — visible
    in the rollup a pipeline operator monitors, not silently dropped."""
    docs = load(spark, sf_dir, "documents")
    planned = resize_plan(decode_media(real_media(docs)), max_side=32)
    return planned.groupBy("kind", "format").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
        F.round(F.avg("target_width"), 4).alias("avg_target_width"),
        F.round(F.avg("target_height"), 4).alias("avg_target_height"),
    )


@query(
    "media_audio_resample",
    oracle=f"""
    WITH m AS ({_M}),
    w AS (SELECT media_id, ns, ws, corrupt FROM m WHERE k = 2),
    res AS (
      SELECT media_id, ns, ws,
             (i.i * 8000) // 6000 AS k, (i.i * 8000) % 6000 AS mm
      FROM (SELECT * FROM w WHERE NOT corrupt),
           unnest(generate_series(0, ((ns - 1) * 6000) // 8000)) AS i(i)
    ),
    vals AS (
      SELECT media_id,
             ((k + ws) % 512 - 256)
             + (((least(k + 1, ns - 1) + ws) % 512 - 256)
                - ((k + ws) % 512 - 256)) * (mm / 6000.0) AS v
      FROM res
    ),
    agg AS (
      SELECT media_id, CAST(count(*) AS BIGINT) AS n_out,
             round(avg(v), 4) AS mean_out,
             round(min(v), 4) AS min_out,
             round(max(v), 4) AS max_out
      FROM vals GROUP BY media_id
    )
    SELECT w.media_id,
           CAST(CASE WHEN corrupt THEN NULL ELSE 8000 END AS INT)
             AS src_rate,
           CAST(6000 AS INT) AS target_rate,
           CAST(CASE WHEN corrupt THEN NULL ELSE ns END AS BIGINT) AS n_in,
           agg.n_out, agg.mean_out, agg.min_out, agg.max_out,
           CASE WHEN corrupt THEN 'wav: truncated data: expected '
                  || CAST(2 * ns AS VARCHAR) || ' bytes, got '
                  || CAST(ns AS VARCHAR) ELSE NULL END AS error
    FROM w LEFT JOIN agg USING (media_id)
    """,
)
def media_audio_resample(spark, sf_dir):
    """Linear-interpolation resampling of every WAV clip 8000 → 6000 Hz
    with per-clip output stats — real DSP over real decoded PCM16, the
    rational-arithmetic form letting the oracle replay every
    interpolated sample exactly; corrupt clips survive as error rows
    (extensions/multimodal.py:resample_audio)."""
    from timeseries_spark.extensions.multimodal import resample_audio

    docs = load(spark, sf_dir, "documents")
    return resample_audio(real_media(docs), target_rate=6000)
