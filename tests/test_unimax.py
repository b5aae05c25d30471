"""unimax_mixture's closed form must equal the paper's literal greedy
loop (ascending sizes, uniform share of the remaining budget capped at
max_epochs*n) in every regime."""

from __future__ import annotations

import pytest


def _greedy(counts: dict[str, int], budget: float, max_epochs: int):
    items = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    remaining = float(budget)
    out = {}
    for idx, (g, n) in enumerate(items):
        share = remaining / (len(items) - idx)
        alloc = min(float(max_epochs * n), share)
        out[g] = alloc
        remaining -= alloc
    return out


def _spark_alloc(spark, counts, budget, max_epochs):
    from data_quality_automated_evaluator_spark.operators.sampling import (
        unimax_mixture,
    )

    rows = [(g, n) for g, n in counts.items()]
    df = spark.createDataFrame(rows, "grp string, toks long")
    got = unimax_mixture(df, "grp", "toks", budget, max_epochs).collect()
    return {r["grp"]: r["alloc_tokens"] for r in got}


@pytest.mark.parametrize(
    "counts,budget",
    [
        # every group cap-limited (huge budget)
        ({"a": 10, "b": 20, "c": 400}, 10_000),
        # every group share-limited (tiny budget)
        ({"a": 100, "b": 200, "c": 400}, 90),
        # mixed: small groups capped, big groups share the rest
        ({"a": 10, "b": 20, "c": 400, "d": 500}, 600),
        # tie sizes break on group name
        ({"a": 50, "b": 50, "c": 50}, 200),
        # single group
        ({"only": 77}, 1_000),
    ],
)
def test_closed_form_equals_greedy(spark, counts, budget):
    want = {g: round(v, 6) for g, v in _greedy(counts, budget, 2).items()}
    got = _spark_alloc(spark, counts, budget, 2)
    assert got == want


def test_allocations_exhaust_budget_when_uncapped(spark):
    counts = {"a": 1000, "b": 2000, "c": 3000}
    got = _spark_alloc(spark, counts, 900, 2)
    assert round(sum(got.values()), 3) == 900.0
