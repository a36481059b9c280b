"""Multimodal columns: opaque binary payloads + typed metadata, with REAL
pure-numpy codecs for the container-friendly formats.

Images/audio travel as ``binary`` columns with a struct of metadata
(``meta``). Decode / feature-extract run as Arrow-batched ``mapInPandas``
operators over those payloads. Three genuine formats are decoded with no
native dependencies — header parse + numpy array over the body:

- **PPM (P6)** binary portable pixmap: ASCII header (magic, dims, maxval,
  ``#`` comments honored) followed by raw RGB bytes;
- **BMP** (24-bit uncompressed, BITMAPINFOHEADER): little-endian header
  fields, 4-byte-aligned row stride, padding stripped;
- **WAV** (RIFF PCM16): chunk walk to ``fmt ``/``data``, int16 samples.

Unknown formats (JPEG/PNG/MP4 need native codecs this container lacks)
and corrupt payloads do NOT fail the job: the row survives with ``error``
set and stats NULL — the behavior a 100 TB ingest needs, where a broken
shard must never kill the pipeline. The legacy synthetic ``IMG:`` format
remains behind ``fake=True`` as a plumbing-only hook.

At 100 TB: payloads dominate row size, so these operators must (a) never
collect, (b) prune the payload column as early as possible (select only
the decoded stats once extracted), and (c) keep batch sizes bounded via
``spark.sql.execution.arrow.maxRecordsPerBatch`` rather than per-row
calls. The decode closures reference module-level parsers — deploy ships
this package to executors (``--py-files``/image), the standard contract.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_spark.functions.parallelism import ensure_parallelism

# ---------------------------------------------------------------------------
# real decoders (pure Python + numpy; no native deps)
# ---------------------------------------------------------------------------


def _decode_ppm(b: bytes) -> dict:
    """P6 binary pixmap: ASCII header tokens (comments allowed) then raw
    RGB. Returns stats over the pixel bytes."""
    import numpy as np

    if b[:2] != b"P6":
        raise ValueError("ppm: bad magic")
    # tokenize header: magic, width, height, maxval; '#' starts a comment
    pos, toks = 2, []
    while len(toks) < 3 and pos < len(b):
        c = b[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
        else:
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            toks.append(b[start:pos])
    if len(toks) < 3:
        raise ValueError("ppm: truncated header")
    pos += 1  # single whitespace after maxval per spec
    w, h, maxval = (int(t) for t in toks)
    if maxval != 255:
        raise ValueError(f"ppm: unsupported maxval {maxval}")
    if w <= 0 or h <= 0:
        # negative dims make n negative, which the truncation check below
        # can't catch (len >= negative is always true) — the row would
        # pass as decoded with garbage negative stats
        raise ValueError(f"ppm: bad dimensions {w}x{h}")
    n = w * h * 3
    body = b[pos : pos + n]
    if len(body) < n:
        raise ValueError(
            f"ppm: truncated body: expected {n} bytes, got {len(body)}"
        )
    arr = np.frombuffer(body, dtype=np.uint8)
    return {
        "format": "ppm",
        "width": w,
        "height": h,
        "channels": 3,
        "sample_rate": None,
        "n_samples": w * h,
        "n_bytes": n,
        "mean_val": float(arr.sum(dtype=np.int64)) / n,
        "_values": arr,  # decoded pixel bytes (internal, stripped)
    }


def _decode_bmp(b: bytes) -> dict:
    """24-bit uncompressed BMP with BITMAPINFOHEADER: little-endian
    header fields, rows padded to 4 bytes (padding excluded from stats)."""
    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    if len(b) < 54:
        raise ValueError("bmp: truncated header")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if hdr_size < 40 or planes != 1:
        raise ValueError("bmp: unsupported header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"bmp: unsupported bpp={bpp} compression={compression}")
    if h < 0:  # top-down variant: same bytes, row order irrelevant to stats
        h = -h
    if w <= 0 or h == 0:
        raise ValueError(f"bmp: bad dimensions {w}x{h}")
    stride = (w * 3 + 3) // 4 * 4
    body = b[data_offset : data_offset + stride * h]
    if len(body) < stride * h:
        raise ValueError(
            f"bmp: truncated body: expected {stride * h} bytes, "
            f"got {len(body)}"
        )
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
    pix = rows[:, : w * 3]
    return {
        "format": "bmp",
        "width": w,
        "height": h,
        "channels": 3,
        "sample_rate": None,
        "n_samples": w * h,
        "n_bytes": w * h * 3,
        "mean_val": float(pix.sum(dtype=np.int64)) / (w * h * 3),
        "_values": pix.ravel(),  # padding stripped (internal)
    }


def _decode_wav(b: bytes) -> dict:
    """RIFF/WAVE PCM16: walk chunks to ``fmt `` and ``data``; samples are
    little-endian int16."""
    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("wav: bad magic")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        if cid == b"fmt ":
            if pos + 8 + 16 > len(b):
                # struct.error is NOT a ValueError: an unguarded
                # unpack_from would escape the decode loop's except
                # clause and fail the task instead of emitting an
                # error row
                raise ValueError("wav: truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", b, pos + 8)
        elif cid == b"data":
            data = (pos + 8, size)
            break  # data is last in our fixtures; stats need no more
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"wav: unsupported format={audio_format} bits={bits}")
    off, size = data
    body = b[off : off + size]
    if len(body) < size:
        raise ValueError(
            f"wav: truncated data: expected {size} bytes, got {len(body)}"
        )
    samples = np.frombuffer(body[: len(body) // 2 * 2], dtype="<i2")
    n = len(samples)
    return {
        "format": "wav",
        "width": None,
        "height": None,
        "channels": channels,
        "sample_rate": sample_rate,
        "n_samples": n,
        "n_bytes": size,
        "mean_val": float(samples.sum(dtype=np.int64)) / n if n else 0.0,
        "_values": samples,  # decoded int16 samples (internal)
    }


def _sniff_and_decode(payload: bytes) -> dict:
    b = bytes(payload)
    if b[:2] == b"P6":
        return _decode_ppm(b)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:4] == b"RIFF":
        return _decode_wav(b)
    raise ValueError(f"unsupported format: {b[:4].hex()}")


_NULL_STATS = {
    "format": None,
    "width": None,
    "height": None,
    "channels": None,
    "sample_rate": None,
    "n_samples": None,
    "n_bytes": None,
    "mean_val": None,
}

_STAT_COLS = list(_NULL_STATS)


DECODED_SCHEMA = (
    "media_id bigint, kind string, format string, width int, height int, "
    "channels int, sample_rate int, n_samples bigint, n_bytes bigint, "
    "mean_val double, error string"
)

# legacy fake-codec output shape (plumbing-only hook)
DECODED_SCHEMA_FAKE = (
    "media_id bigint, kind string, width int, height int, n_bytes bigint, "
    "mean_byte double"
)


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary payloads to typed stats via Arrow-batched
    ``mapInPandas``.

    The default path runs the REAL pure-numpy codecs (PPM / BMP / WAV —
    see module docstring); a row whose payload is corrupt or in a format
    needing native codecs survives with ``error`` set and stats NULL,
    never failing the job. ``fake=True`` keeps the legacy synthetic
    ``IMG:<w>x<h>:<data>`` parser for plumbing-only tests."""
    if fake:

        def fake_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

        return ensure_parallelism(df).mapInPandas(
            fake_batches, schema=DECODED_SCHEMA_FAKE
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            rows = []
            for payload in pdf["payload"]:
                try:
                    d = _sniff_and_decode(payload)
                    rows.append(
                        {k: d[k] for k in _STAT_COLS} | {"error": None}
                    )
                except (ValueError, struct.error) as e:
                    # struct.error: defense in depth — a malformed header
                    # slipping past the explicit guards must still become
                    # an error row, never a task failure
                    rows.append({**_NULL_STATS, "error": str(e)})
            out = _pd.DataFrame(rows, columns=_STAT_COLS + ["error"])
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out

    # payload decode is compute-bound: spread small-file inputs over the
    # cluster before the Python stage (no-op when already partitioned)
    return ensure_parallelism(df).mapInPandas(batches, schema=DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# fixture generators: REAL format payloads, deterministic from doc_id
# ---------------------------------------------------------------------------


def _ppm_payload(w: int, h: int, seed: int) -> bytes:
    import numpy as np

    body = ((np.arange(w * h * 3, dtype=np.int64) + seed) % 256).astype(
        np.uint8
    )
    return f"P6\n{w} {h}\n255\n".encode() + body.tobytes()


def _bmp_payload(w: int, h: int, seed: int) -> bytes:
    import numpy as np

    stride = (w * 3 + 3) // 4 * 4
    pix = ((np.arange(w * h * 3, dtype=np.int64) + seed) % 256).astype(
        np.uint8
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pix.reshape(h, w * 3)
    file_header = struct.pack("<2sIHHI", b"BM", 54 + stride * h, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    return file_header + info_header + rows.tobytes()


def _wav_payload(n_samples: int, seed: int) -> bytes:
    import numpy as np

    samples = (
        ((np.arange(n_samples, dtype=np.int64) + seed) % 512) - 256
    ).astype("<i2")
    data = samples.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def real_media(documents: DataFrame, corrupt_every: int = 97) -> DataFrame:
    """Media table with REAL format payloads, deterministic from doc_id —
    the multimodal fixtures the decode operators run against.

    Cycle by ``doc_id % 3``: PPM image / BMP image / WAV audio. Sizes and
    the byte/sample pattern are arithmetic in doc_id, so an ANSI-SQL
    oracle can replay every decoded stat exactly. Every
    ``corrupt_every``-th doc keeps a valid header but only half its body
    bytes — the corrupt-shard case the decoder must survive as an error
    row. Output: (media_id, kind, payload, meta)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            out = {
                "media_id": [],
                "kind": [],
                "payload": [],
                "width": [],
                "height": [],
                "duration_ms": [],
                "codec": [],
            }
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                k = d % 3
                if k == 0:
                    w, h = d % 64 + 16, d % 48 + 16
                    payload = _ppm_payload(w, h, d % 251)
                    body_len = w * h * 3
                    kind, codec, dur = "image", "ppm", None
                elif k == 1:
                    w, h = d % 32 + 8, d % 24 + 8
                    payload = _bmp_payload(w, h, d % 251)
                    body_len = (w * 3 + 3) // 4 * 4 * h
                    kind, codec, dur = "image", "bmp", None
                else:
                    ns = d % 400 + 100
                    payload = _wav_payload(ns, d % 512)
                    body_len = 2 * ns
                    w = h = None
                    kind, codec, dur = "audio", "wav", ns * 1000 // 8000
                if corrupt_every and d % corrupt_every == 0:
                    payload = payload[: len(payload) - body_len + body_len // 2]
                out["media_id"].append(d)
                out["kind"].append(kind)
                out["payload"].append(payload)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(dur)
                out["codec"].append(codec)
            yield _pd.DataFrame(out)

    flat = ensure_parallelism(documents.select("doc_id")).mapInPandas(
        batches,
        schema=(
            "media_id bigint, kind string, payload binary, width int, "
            "height int, duration_ms int, codec string"
        ),
    )
    return flat.select(
        "media_id",
        "kind",
        "payload",
        F.struct("width", "height", "duration_ms", "codec").alias("meta"),
    )


def synthetic_media(documents: DataFrame) -> DataFrame:
    """Legacy deterministic fake media table (payload =
    b"IMG:<w>x<h>:" + utf8(text)) — kept as the plumbing-only hook for
    the ``fake=True`` decode path."""
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


def extract_features(
    df: DataFrame, n_bins: int = 16, fake: bool = False
) -> DataFrame:
    """Feature extraction over binary payloads: Arrow-batched mapInPandas
    emitting a fixed-size ``array<double>`` embedding per media row — the
    exact shape the similarity-search operators consume downstream.

    The default path DECODES the payload with the real codecs and emits
    an L1-normalized ``n_bins`` histogram of the decoded values (pixel
    bytes 0..255; audio samples shifted from [-256, 255] into the same
    range) — a genuine content embedding with zero native deps. Rows
    that fail decode emit a NULL feature (never fail the job).
    ``fake=True`` keeps the legacy raw-payload-bytes histogram for
    plumbing-only tests."""
    if fake:

        def fake_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

        return ensure_parallelism(df).mapInPandas(
            fake_batches, schema=FEATURES_SCHEMA
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                try:
                    d = _sniff_and_decode(payload)
                    vals = d["_values"].astype(np.int64)
                    if d["format"] == "wav":
                        # map int16 samples onto the byte scale: the
                        # fixture pattern spans [-256, 255] -> [0, 255];
                        # real-world full-range audio still bins sanely
                        vals = np.clip((vals + 256) // 2, 0, 255)
                    idx = vals * n_bins // 256
                    counts = np.bincount(idx, minlength=n_bins)[:n_bins]
                    total = float(len(vals)) or 1.0
                    feats.append([c / total for c in counts])
                except (ValueError, struct.error):
                    feats.append(None)
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return ensure_parallelism(df).mapInPandas(batches, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for timed media rows: the millisecond offsets a
    real frame grabber would decode, one array per row (pure column math).
    Rows without a duration (images) get an empty plan. Output adds
    ``frame_offsets_ms: array<int>``."""
    dur = F.col("meta.duration_ms")
    return media.withColumn(
        "frame_offsets_ms",
        F.when(
            dur.isNotNull() & (dur > 0),
            F.sequence(F.lit(0), dur - 1, F.lit(every_ms)),
        ).otherwise(F.array().cast("array<int>")),
    )


RESAMPLED_SCHEMA = (
    "media_id bigint, src_rate int, n_in bigint, n_out bigint, "
    "mean_out double, min_out double, max_out double, error string"
)


def resample_audio(media: DataFrame, target_rate: int = 6000) -> DataFrame:
    """Real DSP over the audio payloads: linear-interpolation resampling
    of the decoded PCM16 stream to ``target_rate`` Hz, reported as
    per-clip stats. Output sample i sits at source position
    x = i·src/target; with k = ⌊x⌋ and the remainder m = (i·src) mod
    target, the value is s[k] + (s[k+1] − s[k])·(m/target) — kept in
    that exact rational-arithmetic form (integer quotient/remainder,
    ONE double division) so a SQL engine replays every interpolated
    value bit-for-bit.

    Runs as the same Arrow-batched ``mapInPandas`` contract as
    ``decode_media``: the audio subset is filtered declaratively BEFORE
    the Python boundary (payload bytes for images never cross), decode
    errors survive as error rows, and per-clip state is bounded by clip
    length. Output: (media_id, src_rate, n_in, n_out, mean_out,
    min_out, max_out, error), stats 4dp-rounded plus the echoed
    ``target_rate`` column appended Spark-side."""
    if target_rate < 1:
        raise ValueError(f"target_rate must be >= 1, got {target_rate}")
    tgt = int(target_rate)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in it:
            out = {c.split()[0]: [] for c in RESAMPLED_SCHEMA.split(", ")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = dict.fromkeys(out)
                row["media_id"] = int(mid)
                try:
                    d = _decode_wav(bytes(payload))
                    s = d["_values"].astype(np.int64)
                    n, src = len(s), int(d["sample_rate"])
                    if n < 1:
                        raise ValueError("wav: empty stream")
                    n_out = ((n - 1) * tgt) // src + 1
                    i = np.arange(n_out, dtype=np.int64)
                    num = i * src
                    k = num // tgt
                    m = num % tgt
                    a = s[k].astype(np.float64)
                    b = s[np.minimum(k + 1, n - 1)].astype(np.float64)
                    v = a + (b - a) * (m / float(tgt))
                    row.update(
                        src_rate=src,
                        n_in=n,
                        n_out=int(n_out),
                        mean_out=float(v.sum() / n_out),
                        min_out=float(v.min()),
                        max_out=float(v.max()),
                    )
                except ValueError as e:
                    row["error"] = str(e)
                for c, val in row.items():
                    out[c].append(val)
            yield _pd.DataFrame(out)

    audio = ensure_parallelism(
        media.where(F.col("kind") == "audio").select("media_id", "payload")
    )
    res = audio.mapInPandas(batches, schema=RESAMPLED_SCHEMA)
    return res.select(
        "media_id",
        "src_rate",
        F.lit(tgt).alias("target_rate"),
        "n_in",
        "n_out",
        F.round("mean_out", 4).alias("mean_out"),
        F.round("min_out", 4).alias("min_out"),
        F.round("max_out", 4).alias("max_out"),
        "error",
    )
