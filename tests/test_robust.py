"""Trimmed / winsorized interval stats — hand-computed values, outlier
resistance, and the single-Exchange plan gate."""

from __future__ import annotations

import datetime as dt

from data_quality_automated_evaluator_spark.operators.robust import (
    trimmed_interval_stats,
)


def _frame(spark, values, group="a", day=1):
    ts = dt.datetime(2024, 5, day, 9, 0, 0)
    rows = [(group, ts, float(v), i) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, ["g", "ts", "v", "id"])


def _stats(spark, values, alpha=0.05):
    df = _frame(spark, values)
    return trimmed_interval_stats(df, "v", "ts", "g", "id", alpha).collect()[0]


def test_hand_computed_trim_and_winsor(spark):
    # 20 values, alpha=0.1 → k=2: drop two smallest and two largest
    vals = list(range(1, 21))  # 1..20
    r = _stats(spark, vals, alpha=0.1)
    assert r["n"] == 20
    assert r["mean"] == 10.5
    kept = vals[2:-2]  # 3..18
    assert r["trimmed_mean"] == round(sum(kept) / len(kept), 6)  # 10.5
    # winsorized: clamp 1,2→3 and 19,20→18
    wins = [3, 3] + kept + [18, 18]
    assert r["winsorized_mean"] == round(sum(wins) / 20, 6)


def test_outlier_resistance(spark):
    vals = [10.0] * 18 + [1e6, -1e6]
    r = _stats(spark, vals, alpha=0.1)  # k=2 strips both outliers
    assert r["trimmed_mean"] == 10.0
    assert r["winsorized_mean"] == 10.0
    assert abs(r["mean"] - 9.0) < 1e-6  # raw mean barely survives


def test_small_n_trims_nothing(spark):
    r = _stats(spark, [1, 2, 3], alpha=0.05)  # k = floor(0.15) = 0
    assert r["trimmed_mean"] == 2.0
    assert r["winsorized_mean"] == 2.0


def test_single_exchange_plan(spark):
    df = _frame(spark, range(10))
    out = trimmed_interval_stats(df, "v", "ts", "g", "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # rank window and groupBy share the (g, day) partitioning: the only
    # Exchanges are that one plus the final orderBy range partitioning
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex == 1, plan
