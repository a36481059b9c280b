"""JSONL source/sink: byte-faithful round-trip under hostile content
(embedded newlines, quotes, unicode, NULLs) and schema enforcement."""

from __future__ import annotations

import shutil

from timeseries_spark.sources.io import read_jsonl, write_jsonl

PATH = "/tmp/ts_jsonl_test/hostile"


def test_roundtrip_hostile_strings_and_nulls(spark):
    rows = [
        (1, 'line\nbreak and "quotes" and \\backslash\\', "en"),
        (2, "unicode: żółć — 中文 🎉", None),
        (3, None, "de"),
        (4, "", "fr"),  # empty string must not become NULL
    ]
    df = spark.createDataFrame(rows, "id long, text string, lang string")
    shutil.rmtree(PATH, ignore_errors=True)
    write_jsonl(df, PATH)
    back = read_jsonl(spark, PATH, "id long, text string, lang string")
    assert {tuple(r) for r in back.collect()} == set(rows)


def test_missing_fields_surface_as_nulls(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    shutil.rmtree(PATH + "2", ignore_errors=True)
    write_jsonl(df, PATH + "2")
    back = read_jsonl(
        spark, PATH + "2", "id long, text string, extra string"
    )
    [row] = back.collect()
    assert (row["id"], row["text"], row["extra"]) == (1, "x", None)
