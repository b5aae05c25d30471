"""Event-flow analytics (operators/eventflow.py): cohort retention,
funnel fold-vs-greedy parity, EWMA forecast semantics, plan shape."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.eventflow import (
    cohort_retention,
    ewma_deviation,
    funnel_conversion,
)

T0 = dt.datetime(2025, 3, 3)  # a Monday


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )


def test_cohort_retention_counts(spark):
    # u1,u2 join week 0; u1 returns week 1; u3 joins week 1
    rows = [
        (1, T0, "view", 0.0),
        (2, T0 + dt.timedelta(days=1), "view", 0.0),
        (1, T0 + dt.timedelta(days=7), "view", 0.0),
        (3, T0 + dt.timedelta(days=8), "view", 0.0),
    ]
    got = {
        (r["cohort_week"].date(), r["week_offset"]): (
            r["n_active"], r["cohort_size"], r["retention"]
        )
        for r in cohort_retention(_events(spark, rows), "user_id", "ts").collect()
    }
    w0, w1 = T0.date(), (T0 + dt.timedelta(days=7)).date()
    assert got == {
        (w0, 0): (2, 2, 1.0),
        (w0, 1): (1, 2, 0.5),
        (w1, 0): (1, 1, 1.0),
    }


def _greedy_depth(seq, steps=("view", "click", "purchase")):
    stage, at = 0, None
    for ts, typ in sorted(seq):
        if stage < len(steps) and typ == steps[stage] and (
            stage == 0 or ts > at
        ):
            stage, at = stage + 1, ts
    return stage


def test_funnel_ordering_semantics(spark):
    rows = [
        # u1: full funnel in order
        (1, T0, "view", 0.0),
        (1, T0 + dt.timedelta(minutes=1), "click", 0.0),
        (1, T0 + dt.timedelta(minutes=2), "purchase", 0.0),
        # u2: click BEFORE view — only the view counts
        (2, T0, "click", 0.0),
        (2, T0 + dt.timedelta(minutes=1), "view", 0.0),
        # u3: purchase without click — depth 1
        (3, T0, "view", 0.0),
        (3, T0 + dt.timedelta(minutes=1), "purchase", 0.0),
        # u4: next day, view+click only
        (4, T0 + dt.timedelta(days=1), "view", 0.0),
        (4, T0 + dt.timedelta(days=1, minutes=5), "click", 0.0),
    ]
    got = {
        r["day"].date(): (r["n_step1"], r["n_step2"], r["n_step3"],
                          r["rate_1_to_2"], r["rate_2_to_3"])
        for r in funnel_conversion(
            _events(spark, rows), "user_id", "ts", "event_type"
        ).collect()
    }
    assert got == {
        T0.date(): (3, 1, 1, round(1 / 3, 6), 1.0),
        (T0 + dt.timedelta(days=1)).date(): (1, 1, 0, 1.0, 0.0),
    }


def test_funnel_matches_greedy_reference(spark):
    rng = random.Random(7)
    rows, ref = [], {}
    for u in range(40):
        seq = []
        for k in range(rng.randint(1, 12)):
            ts = T0 + dt.timedelta(minutes=rng.randint(0, 500))
            typ = rng.choice(["view", "click", "purchase", "error"])
            seq.append((ts, typ))
        rows += [(u, ts, typ, 0.0) for ts, typ in seq]
        d = _greedy_depth([(t, y) for t, y in seq if y != "error"])
        ref[u] = d
    exp = [
        sum(1 for d in ref.values() if d >= k) for k in (1, 2, 3)
    ]
    row = funnel_conversion(
        _events(spark, rows), "user_id", "ts", "event_type"
    ).collect()
    assert len(row) == 1
    assert [row[0]["n_step1"], row[0]["n_step2"], row[0]["n_step3"]] == exp


def test_ewma_forecast_is_strictly_preceding(spark):
    # x = [10, 20, 40]: forecast(d2)=10; forecast(d3)=(40*... no —
    # weights q^(d-1): d3 sees x1 w=0.5, x2 w=1 → (10*.5+20)/1.5
    rows = [
        (1, T0 + dt.timedelta(days=i), "a", v)
        for i, v in enumerate([10.0, 20.0, 40.0])
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    got = ewma_deviation(df, "value", "ts", "event_type").orderBy("day").collect()
    assert got[0]["forecast"] is None and got[0]["is_break"] is False
    assert got[1]["forecast"] == 10.0 and got[1]["deviation"] == 10.0
    assert got[2]["forecast"] == round((10 * 0.5 + 20) / 1.5, 6)
    # a +60 break on the third day trips the default 30 threshold
    rows2 = rows[:2] + [(1, T0 + dt.timedelta(days=2), "a", 80.0)]
    df2 = spark.createDataFrame(
        rows2, "user_id long, ts timestamp, event_type string, value double"
    )
    got2 = ewma_deviation(df2, "value", "ts", "event_type").orderBy("day").collect()
    assert got2[2]["is_break"] is True


def test_plans_are_jvm_only(spark):
    rows = [(1, T0, "view", 1.0), (1, T0 + dt.timedelta(minutes=1), "click", 2.0)]
    df = _events(spark, rows)
    for out in (
        cohort_retention(df, "user_id", "ts"),
        funnel_conversion(df, "user_id", "ts", "event_type"),
        ewma_deviation(df, "value", "ts", "event_type"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
    # the funnel is ONE corpus shuffle: (u, day) partial+final, then the
    # day rollup runs on the per-user-day frame
    fplan = (
        funnel_conversion(df, "user_id", "ts", "event_type")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert fplan.count("Aggregate [") == 2


def test_rolling_active_users_exact(spark):
    from data_quality_automated_evaluator_spark.operators.eventflow import (
        rolling_active_users,
    )

    # u1 active d0,d2; u2 active d0; u3 joins d9 (gap > window from d2)
    rows = [
        (1, T0, "view", 0.0),
        (1, T0 + dt.timedelta(hours=3), "click", 0.0),  # same day, dedup
        (2, T0, "view", 0.0),
        (1, T0 + dt.timedelta(days=2), "view", 0.0),
        (3, T0 + dt.timedelta(days=9), "view", 0.0),
    ]
    got = {
        r["day"].date(): (r["dau"], r["dau_new"], r["wau_7"], r["new_rate"])
        for r in rolling_active_users(
            _events(spark, rows), "user_id", "ts"
        ).collect()
    }
    d = lambda k: (T0 + dt.timedelta(days=k)).date()  # noqa: E731
    assert got == {
        d(0): (2, 2, 2, 1.0),        # u1,u2 both new
        d(2): (1, 0, 2, 0.0),        # u1 returns; window still holds u2
        d(9): (1, 1, 1, 1.0),        # d2 activity expired (d2+6=d8 < d9)
    }
    # only observed days appear — no phantom rows from the expansion
    assert set(got) == {d(0), d(2), d(9)}
