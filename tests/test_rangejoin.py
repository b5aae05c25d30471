"""Range-join operator: bucket decomposition vs the naive non-equi join.

The operator must (a) agree row-for-row with the straightforward
``p.ts >= start AND p.ts < end`` join on adversarial boundary cases, and
(b) never plan a BroadcastNestedLoopJoin / CartesianProduct — the whole
point of the bucket decomposition.
"""
from __future__ import annotations

import datetime as dt
import io
import contextlib

from pyspark.sql import functions as F
from pyspark.sql.types import (
    StructType,
    StructField,
    StringType,
    TimestampType,
    IntegerType,
)

from data_quality_automated_evaluator_spark.operators.rangejoin import (
    range_join_points,
)

TS = dt.datetime


def _frames(spark):
    pts_schema = StructType(
        [
            StructField("k", StringType()),
            StructField("ts", TimestampType()),
            StructField("pid", IntegerType()),
        ]
    )
    ivl_schema = StructType(
        [
            StructField("k", StringType()),
            StructField("start_ts", TimestampType()),
            StructField("end_ts", TimestampType()),
            StructField("iid", IntegerType()),
        ]
    )
    points = spark.createDataFrame(
        [
            ("a", TS(2024, 1, 1, 0, 0, 0), 1),   # exactly at a start
            ("a", TS(2024, 1, 2, 23, 59, 59), 2),
            ("a", TS(2024, 1, 3, 0, 0, 0), 3),   # exactly at an end (excluded)
            ("a", TS(2024, 1, 5, 12, 0, 0), 4),  # inside a multi-day interval
            ("b", TS(2024, 1, 1, 6, 0, 0), 5),   # same ts, other key
            ("b", TS(2024, 2, 1, 0, 0, 0), 6),   # no interval
            (None, TS(2024, 1, 1, 6, 0, 0), 7),  # NULL key never matches
        ],
        pts_schema,
    )
    intervals = spark.createDataFrame(
        [
            ("a", TS(2024, 1, 1), TS(2024, 1, 3), 10),      # 2-day window
            ("a", TS(2024, 1, 2), TS(2024, 1, 4), 11),      # overlaps 10
            ("a", TS(2024, 1, 4), TS(2024, 1, 8), 12),      # 4-day window
            ("a", TS(2024, 1, 1, 6), TS(2024, 1, 1, 18), 13),  # sub-bucket
            ("b", TS(2024, 1, 1), TS(2024, 1, 2), 14),
            (None, TS(2024, 1, 1), TS(2024, 1, 9), 15),     # NULL key
        ],
        ivl_schema,
    )
    return points, intervals


def test_range_join_matches_naive(spark):
    points, intervals = _frames(spark)
    got = (
        range_join_points(points, intervals, keys=["k"])
        .select("pid", "iid")
        .collect()
    )
    naive = (
        points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.k") == F.col("i.k"))
            & (F.col("p.ts") >= F.col("i.start_ts"))
            & (F.col("p.ts") < F.col("i.end_ts")),
        )
        .select("pid", "iid")
        .collect()
    )
    assert sorted((r.pid, r.iid) for r in got) == sorted(
        (r.pid, r.iid) for r in naive
    )
    pairs = {(r.pid, r.iid) for r in got}
    assert (1, 10) in pairs          # inclusive start
    assert (3, 10) not in pairs      # exclusive end
    assert (3, 11) in pairs          # but inside the overlapping window
    assert (4, 12) in pairs          # multi-bucket interval reaches day 4+
    assert not any(p == 7 or i == 15 for p, i in pairs)  # NULLs never match


def test_range_join_no_duplicate_pairs(spark):
    points, intervals = _frames(spark)
    out = range_join_points(points, intervals, keys=["k"]).select("pid", "iid")
    assert out.count() == out.distinct().count()


def test_range_join_plan_is_hash_join(spark):
    points, intervals = _frames(spark)
    out = range_join_points(points, intervals, keys=["k"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_range_join_bucket_width_validation(spark):
    points, intervals = _frames(spark)
    import pytest

    with pytest.raises(ValueError):
        range_join_points(points, intervals, keys=["k"], bucket_width_seconds=0)


def test_range_join_fractional_second_end(spark):
    """An interval whose exclusive end falls a FRACTION of a second past
    a bucket boundary still claims that final bucket: end = day-boundary
    + 0.5s covers points in [boundary, boundary+0.5s). The old
    whole-second end-bucket computation (end - INTERVAL 1 SECOND under
    unix_timestamp truncation) silently dropped it."""
    pts_schema = StructType(
        [
            StructField("k", StringType()),
            StructField("ts", TimestampType()),
            StructField("pid", IntegerType()),
        ]
    )
    ivl_schema = StructType(
        [
            StructField("k", StringType()),
            StructField("start_ts", TimestampType()),
            StructField("end_ts", TimestampType()),
            StructField("iid", IntegerType()),
        ]
    )
    # interval [Jan1 12:00, Jan3 00:00:00.500000) — end is 0.5s past the
    # Jan3 bucket boundary (1-day buckets)
    points = spark.createDataFrame(
        [
            ("a", TS(2024, 1, 3, 0, 0, 0, 250_000), 1),  # in [boundary, end)
            ("a", TS(2024, 1, 3, 0, 0, 0, 500_000), 2),  # == end: excluded
            ("a", TS(2024, 1, 2, 23, 59, 59, 999_999), 3),  # just before
        ],
        pts_schema,
    )
    intervals = spark.createDataFrame(
        [("a", TS(2024, 1, 1, 12), TS(2024, 1, 3, 0, 0, 0, 500_000), 20)],
        ivl_schema,
    )
    pairs = {
        (r.pid, r.iid)
        for r in range_join_points(points, intervals, keys=["k"])
        .select("pid", "iid")
        .collect()
    }
    assert pairs == {(1, 20), (3, 20)}

    # and an end exactly ON the boundary still does NOT reach past it
    intervals_on = spark.createDataFrame(
        [("a", TS(2024, 1, 1, 12), TS(2024, 1, 3), 21)], ivl_schema
    )
    pairs_on = {
        (r.pid, r.iid)
        for r in range_join_points(points, intervals_on, keys=["k"])
        .select("pid", "iid")
        .collect()
    }
    assert pairs_on == {(3, 21)}
