"""Exact order-statistic quantiles and quality-tier assignment —
hand-computed rank lookups, tie handling, balanced tier sizes."""

from __future__ import annotations

import datetime as dt

from data_quality_automated_evaluator_spark.operators.robust import (
    exact_quantiles_by_interval,
)
from data_quality_automated_evaluator_spark.operators.sampling import (
    quality_tiers,
)


def test_quantiles_rank_lookup(spark):
    ts = dt.datetime(2024, 5, 3, 8, 0, 0)
    rows = [("a", ts, float(v), i) for i, v in enumerate(range(1, 101))]
    df = spark.createDataFrame(rows, ["g", "ts", "v", "id"])
    r = exact_quantiles_by_interval(df, "v", "ts", "g", "id").collect()[0]
    # n=100: p50 = value at rank 50 = 50, p90 → rank 90, p99 → rank 99
    assert r["n"] == 100
    assert r["p50"] == 50.0
    assert r["p90"] == 90.0
    assert r["p99"] == 99.0


def test_quantiles_small_group_and_ties(spark):
    ts = dt.datetime(2024, 5, 3, 8, 0, 0)
    rows = [("a", ts, v, i) for i, v in enumerate([7.0, 7.0, 7.0, 9.0])]
    df = spark.createDataFrame(rows, ["g", "ts", "v", "id"])
    r = exact_quantiles_by_interval(df, "v", "ts", "g", "id").collect()[0]
    # n=4: p50 → rank ceil(2)=2 → 7.0; p90/p99 → rank 4 → 9.0
    assert r["p50"] == 7.0 and r["p90"] == 9.0 and r["p99"] == 9.0


def test_tiers_balanced_and_ordered(spark):
    rows = [(i, "s", float(100 - i)) for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    out = quality_tiers(df, "source", "score", "doc_id").collect()
    got = {r["doc_id"]: r["tier"] for r in out}
    # scores descend with doc_id: doc 0,1 → tier 0 … doc 6,7 → tier 3
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3}


def test_tiers_uneven_sizes_within_one(spark):
    rows = [(i, "s", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    out = quality_tiers(df, "source", "score", "doc_id", n_tiers=4).collect()
    sizes = {}
    for r in out:
        sizes[r["tier"]] = sizes.get(r["tier"], 0) + 1
    assert sorted(sizes) == [0, 1, 2, 3]
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_tiers_tie_scores_break_on_key(spark):
    rows = [(i, "s", 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    got = {
        r["doc_id"]: r["tier"]
        for r in quality_tiers(df, "source", "score", "doc_id").collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
