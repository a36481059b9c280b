"""Deequ-style constraint suite + SCD2 history build (round 6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseries_spark.extensions.dataquality import (
    Check,
    completeness,
    in_set,
    max_value,
    min_value,
    referential_check,
    row_count,
    run_checks,
    uniqueness,
)


def _report(df):
    return {
        r["check_name"]: (r["metric"], r["passed"]) for r in df.collect()
    }


def test_run_checks_pass_and_fail(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (3, None, 2.0), (3, "a", 0.0)],
        "id bigint, tag string, x double",
    )
    rep = _report(
        run_checks(
            df,
            [
                completeness("tag"),  # 3/4 -> fail at 1.0
                uniqueness("id"),  # 3 distinct / 4 -> fail
                min_value("x", 0.0),  # min -1 -> fail
                max_value("x", 10.0),  # max 5 -> pass
                in_set("tag", ["a", "b"], min_ratio=0.5),  # 3/4 -> pass
                row_count(4),  # pass
            ],
        )
    )
    assert rep["completeness(tag)"] == (0.75, False)
    assert rep["uniqueness(id)"] == (0.75, False)
    assert rep["min(x)"] == (-1.0, False)
    assert rep["max(x)"] == (5.0, True)
    assert rep["in_set(tag)"] == (0.75, True)
    assert rep["row_count"] == (4.0, True)


def test_run_checks_empty_input_fails_loudly(spark):
    df = spark.createDataFrame([], "id bigint, tag string")
    rep = _report(
        run_checks(df, [completeness("tag"), row_count(1), uniqueness("id")])
    )
    # empty input: ratios are 0.0 (not vacuous 1.0), counts are 0
    assert rep["completeness(tag)"] == (0.0, False)
    assert rep["row_count"] == (0.0, False)
    assert rep["uniqueness(id)"] == (0.0, False)


def test_run_checks_validates_input(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="at least one"):
        run_checks(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        run_checks(df, [row_count(1), row_count(2)])


def test_referential_orphans_counted(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk bigint"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    row = referential_check(child, "fk", parent, "pk").collect()[0]
    # one orphan (9); the NULL fk is excluded by contract
    assert row["metric"] == 1.0 and row["passed"] is False
    clean = referential_check(
        child.where(F.col("fk") < 3), "fk", parent, "pk"
    ).collect()[0]
    assert clean["metric"] == 0.0 and clean["passed"] is True


def test_custom_check_direction(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    # ge=False: metric must be <= threshold
    rep = _report(
        run_checks(df, [Check("avg_le", F.avg("x"), 1.0, ge=False)])
    )
    assert rep["avg_le"] == (1.5, False)


def test_scd2_intervals_chain(spark):
    from timeseries_spark.queries.dataquality import scd2_user_status  # noqa

    rows = [
        # user 1: view -> view -> click -> view  => 3 intervals
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 00:01:00", 1, "view"),
        (3, "2024-01-01 00:02:00", 1, "click"),
        (4, "2024-01-01 00:03:00", 1, "view"),
        # user 2: single event => one current interval
        (5, "2024-01-01 00:00:30", 2, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        # exercise the registered query end-to-end via a tiny sf_dir
        df.select(
            "event_id", "ts", "user_id", "event_type"
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = scd2_user_status(spark, d).collect()

    by_user = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["valid_from_us"])):
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = by_user[1]
    assert [r["event_type"] for r in u1] == ["view", "click", "view"]
    # half-open chaining: each valid_to equals the next valid_from
    assert u1[0]["valid_to_us"] == u1[1]["valid_from_us"]
    assert u1[1]["valid_to_us"] == u1[2]["valid_from_us"]
    assert u1[2]["valid_to_us"] is None and u1[2]["is_current"]
    assert not u1[0]["is_current"] and not u1[1]["is_current"]
    (u2,) = by_user[2]
    assert u2["is_current"] and u2["event_type"] == "purchase"


def test_min_max_empty_input_fails_not_null(spark):
    # ADVICE r6: F.min/F.max over zero rows is NULL — the report must
    # still FAIL the check (passed=False), keeping the NULL metric as
    # the "no rows" signal rather than propagating NULL into passed
    from timeseries_spark.extensions.dataquality import max_value, min_value

    df = spark.createDataFrame([], "id bigint, v double")
    rows = {
        r["check_name"]: (r["metric"], r["passed"])
        for r in run_checks(df, [min_value("v", 0.0), max_value("v", 10.0)]).collect()
    }
    assert rows["min(v)"] == (None, False)
    assert rows["max(v)"] == (None, False)
