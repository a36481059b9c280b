"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a struct of metadata
(schemas.MEDIA). Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators — the Spark-side contract (schema,
batch iteration, partitioning) is real and tested; the codec layer is
STUBBED because no image/audio libraries exist in this container:
``decode_media`` raises NotImplementedError unless ``fake=True``, which
substitutes a deterministic parser for the synthetic payload format
(``b"IMG:<width>x<height>:<data>"``).

At 100 TB: payloads dominate row size, so these operators must (a) never
collect, (b) prune the payload column as early as possible (select only
``meta`` once features are extracted), and (c) keep batch sizes bounded via
``spark.sql.execution.arrow.maxRecordsPerBatch`` rather than per-row calls.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_spark.functions.parallelism import ensure_parallelism

DECODED_SCHEMA = (
    "media_id bigint, kind string, width int, height int, n_bytes bigint, "
    "mean_byte double"
)


def _parse_fake(payload: bytes) -> tuple[int, int, bytes]:
    """Deterministic stand-in codec for the synthetic payload format."""
    head, _, data = bytes(payload).partition(b":")
    if head != b"IMG":
        raise ValueError("not a fake IMG payload")
    dims, _, body = data.partition(b":")
    w, _, h = dims.partition(b"x")
    return int(w), int(h), body


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary payloads to typed features via Arrow-batched
    ``mapInPandas``.

    Real codecs (PIL/ffmpeg) are not present in this environment — pass
    ``fake=True`` to exercise the full distributed plumbing against the
    synthetic payload format; without it this raises NotImplementedError
    (clearly-marked stub per the build brief)."""
    if not fake:
        raise NotImplementedError(
            "media codecs unavailable in this container; use fake=True for "
            "the deterministic synthetic-format parser"
        )

    # NOTE: fully self-contained closure (no references to module globals)
    # so cloudpickle ships it by value — executors need neither this
    # package on PYTHONPATH nor anything beyond pandas.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def parse(payload: bytes) -> tuple[int, int, bytes]:
            head, _, data = bytes(payload).partition(b":")
            if head != b"IMG":
                raise ValueError("not a fake IMG payload")
            dims, _, body = data.partition(b":")
            w, _, h = dims.partition(b"x")
            return int(w), int(h), body

        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": [],
                "height": [],
                "n_bytes": [],
                "mean_byte": [],
            }
            for payload in pdf["payload"]:
                w, h, body = parse(payload)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(body))
                out["mean_byte"].append(
                    float(sum(body)) / len(body) if body else 0.0
                )
            yield _pd.DataFrame(out)

    # payload decode is compute-bound: spread small-file inputs over the
    # cluster before the Python stage (no-op when already partitioned)
    return ensure_parallelism(df).mapInPandas(batches, schema=DECODED_SCHEMA)


def synthetic_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents fixture:
    payload = b"IMG:<w>x<h>:" + utf8(text). Exists so the multimodal
    plumbing has a real distributed input without container codecs."""
    w = (F.col("doc_id") % 64 + 16).cast("int")
    h = (F.col("doc_id") % 48 + 16).cast("int")
    payload = F.concat(
        F.lit(b"IMG:"),
        F.encode(F.concat_ws("x", w.cast("string"), h.cast("string")), "utf-8"),
        F.lit(b":"),
        F.encode(F.col("text"), "utf-8"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.struct(
            w.alias("width"),
            h.alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def resize_plan(decoded: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning (pure column math — no codec needed): compute the
    target dims preserving aspect ratio, the shape a real resize UDF would
    consume."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return decoded.withColumns(
        {
            "target_width": F.greatest(
                F.round(F.col("width") * scale).cast("int"), F.lit(1)
            ),
            "target_height": F.greatest(
                F.round(F.col("height") * scale).cast("int"), F.lit(1)
            ),
        }
    )


FEATURES_SCHEMA = "media_id bigint, kind string, feature array<double>"


def extract_features(df: DataFrame, n_bins: int = 16, fake: bool = False) -> DataFrame:
    """Feature extraction over binary payloads: Arrow-batched mapInPandas
    emitting a fixed-size ``array<double>`` embedding per media row — the
    exact shape the similarity-search operators consume downstream.

    The real extractor (CNN features, audio spectra) is STUBBED; the fake
    path computes a deterministic ``n_bins`` byte histogram (L1-normalized)
    of the payload body, so the full distributed contract — binary in,
    vector out, Arrow batches, payload column pruned after this stage —
    is exercised end to end."""
    if not fake:
        raise NotImplementedError(
            "feature extractors unavailable in this container; use "
            "fake=True for the deterministic byte-histogram embedding"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def hist(payload: bytes) -> list[float]:
            body = bytes(payload).rpartition(b":")[2]
            counts = [0] * n_bins
            for b in body:
                counts[b * n_bins // 256] += 1
            total = float(len(body)) or 1.0
            return [c / total for c in counts]

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [hist(p) for p in pdf["payload"]],
                }
            )

    return ensure_parallelism(df).mapInPandas(batches, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: the millisecond offsets a real
    frame grabber would decode, one array per row (pure column math — the
    codec-side grab is the stubbed step). Rows without a duration (images)
    get an empty plan. Output adds ``frame_offsets_ms: array<int>``."""
    dur = F.col("meta.duration_ms")
    return media.withColumn(
        "frame_offsets_ms",
        F.when(
            dur.isNotNull() & (dur > 0),
            F.sequence(F.lit(0), dur - 1, F.lit(every_ms)),
        ).otherwise(F.array().cast("array<int>")),
    )
