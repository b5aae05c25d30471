"""Exact duplicated-substring span detection (operators/spans.py):
cross-document and within-document duplicated k-gram runs, interval
merging (overlap and adjacency), coverage math, parameter validation."""

from __future__ import annotations

import pytest

from data_quality_automated_evaluator_spark.operators.spans import duplicated_span_stats


def _rows(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_stats(df, **kw).collect()
    }


def test_cross_doc_overlapping_grams_merge_into_one_span(spark):
    out = _rows(
        spark,
        [(1, "a b c d e f"), (2, "x a b c d y"), (3, "q r s t u v")],
        k=3,
    )
    # "a b c" and "b c d" are shared; their windows overlap -> one span.
    assert out[1]["n_dup_grams"] == 2
    assert out[1]["n_spans"] == 1
    assert out[1]["covered_tokens"] == 4  # tokens a b c d
    assert out[1]["dup_fraction"] == pytest.approx(4 / 6, abs=1e-6)
    assert out[2]["n_spans"] == 1 and out[2]["covered_tokens"] == 4
    # d3 has no duplicated gram -> no row at all
    assert 3 not in out


def test_within_doc_repeat_counts_and_disjoint_spans(spark):
    # "m n o" occurs twice inside one document: positions 0 and 4 ->
    # intervals [0,2] and [4,6] are disjoint -> two spans, 6 tokens.
    out = _rows(spark, [(1, "m n o p m n o")], k=3)
    assert out[1] == {
        "doc_id": 1,
        "n_tokens": 7,
        "n_dup_grams": 2,
        "n_spans": 2,
        "covered_tokens": 6,
        "dup_fraction": pytest.approx(6 / 7, abs=1e-6),
    }


def test_adjacent_intervals_merge(spark):
    # duplicated grams at positions 0 and 3 with k=3: [0,2] and [3,5]
    # touch (adjacent) -> one span covering 6 tokens.
    docs = [
        (1, "a b c z1 a b c z2"),   # grams "a b c" at 0; plus filler
        (2, "a b c z3 a b c z4"),
    ]
    out = _rows(spark, docs, k=3)
    # in doc 1: "a b c" (pos 0 and 4) duplicated across+within docs
    assert out[1]["n_spans"] == 2  # [0,2] and [4,6] have a gap at 3
    out2 = _rows(spark, [(1, "a b c d e f"), (2, "a b c x d e f")], k=3)
    # doc1: grams "a b c"(0) and "d e f"(3) duplicated -> [0,2],[3,5] adjacent
    assert out2[1]["n_spans"] == 1
    assert out2[1]["covered_tokens"] == 6


def test_short_docs_emit_nothing_and_params_validate(spark):
    df_small = [(1, "a b"), (2, "a b")]
    assert _rows(spark, df_small, k=3) == {}
    with pytest.raises(ValueError):
        _rows(spark, df_small, k=1)
    with pytest.raises(ValueError):
        _rows(spark, df_small, k=3, min_count=1)


def test_rolling_drift_flags(spark):
    from data_quality_automated_evaluator_spark.operators.drift import (
        rolling_drift_flags,
    )

    # steady series with one planted spike at t=10, plus a constant
    # series (std 0 -> never flags) and a warm-up check
    rows = [("a", t, 10.0 + (t % 3) * 0.1) for t in range(15)]
    rows[10] = ("a", 10, 50.0)          # spike
    rows += [("b", t, 5.0) for t in range(6)]        # constant
    rows += [("c", 0, 1.0), ("c", 1, 99.0)]          # too little history
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = rolling_drift_flags(df, "v", "t", ["g"], window=5, z=3.0)
    flagged = {(r["g"], r["t"]) for r in out.collect() if r["drift"]}
    assert ("a", 10) in flagged
    assert not any(g == "b" for g, _ in flagged)     # zero-std guard
    assert not any(g == "c" for g, _ in flagged)     # warm-up guard
    # the spike itself must not poison its own baseline (excluded frame):
    # t=11..14 compare against a window CONTAINING the spike -> huge std
    # -> no false flags after the spike
    assert flagged == {("a", 10)}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        rolling_drift_flags(df, "v", "t", ["g"], window=0)
    with _pytest.raises(ValueError):
        rolling_drift_flags(df, "v", "t", ["g"], min_periods=1)
