"""Key-skew audit — hand-computed Gini/top-share/CV values, uniform-key
degenerate case, and parity of the histogram formulation against a naive
sorted-index recomputation."""

from __future__ import annotations

import math
import random

from data_quality_automated_evaluator_spark.operators.skew import (
    key_skew_audit,
)


def _rows_for(counts: dict[str, int]):
    return [(k,) for k, n in counts.items() for _ in range(n)]


def _naive(counts: list[int]):
    x = sorted(counts)
    n, t = len(x), sum(x)
    s = sum((i + 1) * v for i, v in enumerate(x))
    gini = (2.0 * s - (n + 1.0) * t) / (n * t)
    k = math.ceil(n / 100.0)
    top1pct = sum(sorted(x, reverse=True)[:k]) / t
    mean = t / n
    var = (sum(v * v for v in x) - t * t / n) / (n - 1.0) if n > 1 else 0.0
    cv = math.sqrt(max(var, 0.0)) / mean if n > 1 else 0.0
    return {
        "gini": round(gini, 6),
        "top1_share": round(max(x) / t, 6),
        "top1pct_share": round(top1pct, 6),
        "mean_count": round(mean, 6),
        "cv": round(cv, 6),
    }


def test_hand_computed_values(spark):
    df = spark.createDataFrame(
        _rows_for({"a": 1, "b": 1, "c": 2, "d": 4}), ["k"]
    )
    r = key_skew_audit(df, "k").collect()[0]
    assert r["n_keys"] == 4 and r["n_rows"] == 8 and r["max_count"] == 4
    # sorted x=[1,1,2,4]: Σi·x=25 → gini=(50−5·8)/(4·8)=0.3125
    assert r["gini"] == 0.3125
    assert r["top1_share"] == 0.5
    assert r["top1pct_share"] == 0.5  # ceil(4/100)=1 hottest key
    assert r["mean_count"] == 2.0
    # sumsq=22, var=(22−16)/3=2 → cv=√2/2
    assert r["cv"] == round(math.sqrt(2) / 2, 6)


def test_uniform_keys_zero_skew(spark):
    df = spark.createDataFrame(
        _rows_for({f"k{i}": 3 for i in range(20)}), ["k"]
    )
    r = key_skew_audit(df, "k").collect()[0]
    assert r["gini"] == 0.0 and r["cv"] == 0.0
    assert r["top1_share"] == round(3 / 60, 6)
    assert r["top1pct_share"] == round(3 / 60, 6)


def test_histogram_path_matches_naive_sorted_index(spark):
    rng = random.Random(7)
    counts = {f"k{i:03d}": rng.choice([1, 1, 1, 2, 2, 3, 5, 8, 40])
              for i in range(150)}
    df = spark.createDataFrame(_rows_for(counts), ["k"])
    r = key_skew_audit(df, "k").collect()[0]
    exp = _naive(list(counts.values()))
    for field, want in exp.items():
        assert r[field] == want, field
    assert r["n_keys"] == 150 and r["n_rows"] == sum(counts.values())


def test_hot_key_dominates(spark):
    counts = {f"k{i}": 1 for i in range(99)}
    counts["hot"] = 901
    df = spark.createDataFrame(_rows_for(counts), ["k"])
    r = key_skew_audit(df, "k").collect()[0]
    assert r["top1_share"] == 0.901
    assert r["top1pct_share"] == 0.901  # ceil(100/100)=1 key
    assert r["gini"] > 0.85
