"""MAD robust z-scores (operators/robust.py mad_outliers_by_interval):
pure-Python parity, masking resistance vs the classic z-score, MAD==0
guard, spike planting, and the compacted-series plan shape."""

from __future__ import annotations

import datetime as dt
import statistics

import pytest
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.robust import (
    mad_outliers_by_interval,
)


def _df(spark, series):
    """series: {group: [daily values]} -> one row per (group, day) so the
    daily mean equals the planted value exactly."""
    rows = []
    for g, vals in series.items():
        for i, v in enumerate(vals):
            rows.append(
                (g, dt.datetime(2025, 3, 1 + i), float(v))
            )
    return spark.createDataFrame(rows, "g string, ts timestamp, v double")


def _ref(vals, thresh=3.5):
    """Pure-Python replay: rank-based median, then MAD, then z."""
    def rank_median(xs):
        s = sorted(xs)
        n = len(s)
        lo, hi = (n + 1) // 2, -(-(n + 1) // 2)
        return (s[lo - 1] + s[hi - 1]) / 2

    med = rank_median(vals)
    mad = rank_median([abs(x - med) for x in vals])
    out = []
    for x in vals:
        z = 0.0 if mad == 0 else round(0.6745 * (x - med) / mad, 6)
        out.append((round(x, 6), z, abs(z) > thresh))
    return med, mad, out


def test_matches_pure_python(spark):
    vals = [10.0, 11.5, 9.8, 10.2, 50.0, 10.9, 9.5, 10.4]
    got = (
        mad_outliers_by_interval(_df(spark, {"a": vals}), "v", "ts", "g")
        .orderBy("day")
        .collect()
    )
    _, _, exp = _ref(vals)
    assert [(r["x"], r["robust_z"], r["is_outlier"]) for r in got] == [
        (x, pytest.approx(z, abs=1e-6), o) for x, z, o in exp
    ]


def test_resists_masking_where_zscore_fails(spark):
    # two huge outliers inflate sigma so the classic |z|>3.5 flags
    # NOTHING, while MAD still flags both
    vals = [9.8, 10.2, 9.9, 10.1, 10.0] * 4 + [500.0, 480.0]
    mu = statistics.mean(vals)
    sd = statistics.stdev(vals)
    assert all(abs((x - mu) / sd) < 3.5 for x in vals)  # masking shown
    got = mad_outliers_by_interval(
        _df(spark, {"a": vals}), "v", "ts", "g"
    ).collect()
    flagged = [r["x"] for r in got if r["is_outlier"]]
    assert sorted(flagged) == [480.0, 500.0]


def test_mad_zero_guard_flags_nothing(spark):
    got = mad_outliers_by_interval(
        _df(spark, {"a": [5.0] * 9}), "v", "ts", "g"
    ).collect()
    assert all(r["robust_z"] == 0.0 and not r["is_outlier"] for r in got)


def test_spike_planting_and_group_isolation(spark):
    # day-of-month 7 is index 6 with the March-1 start
    series = {
        "a": [10.0, 10.4, 9.6, 10.2, 9.8, 10.1, 9.9, 10.3, 9.7, 10.05,
              9.95, 10.15, 9.85, 10.25],
        "b": [3.0, 3.2] * 7,
    }
    got = mad_outliers_by_interval(
        _df(spark, series), "v", "ts", "g", spike=60.0
    ).collect()
    flagged = {(r["g"], r["day"].day) for r in got if r["is_outlier"]}
    assert flagged == {("a", 7), ("b", 7)}


def test_plan_compacts_before_windows(spark):
    df = _df(spark, {"a": [1.0, 2.0, 3.0, 4.0]})
    plan = (
        mad_outliers_by_interval(df, "v", "ts", "g")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus-compacting HashAggregate must sit below both windows:
    # exactly one hash-partitioned exchange on (g, day), the rest keyed
    # on g for the window passes
    assert plan.count("HashAggregate") >= 2  # partial+final compaction
    assert "Generate" not in plan and "Python" not in plan
