"""Zipf rank-frequency slope — numpy OLS reference parity and the
scale-shape gate (top-k cut must be TakeOrdered, not a global window
over the vocabulary)."""

from __future__ import annotations

import math
import re

import numpy as np

from data_quality_automated_evaluator_spark.functions.textstats import (
    zipf_slope_stats,
)


def _py_ref(texts, topk=1000):
    from collections import Counter

    c = Counter()
    for t in texts:
        c.update(w for w in re.split(r"\s+", t.strip().lower()) if w)
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    qx = np.array(
        [math.floor(math.log2(r) * 1e6 + 0.5) for r in range(1, len(top) + 1)],
        dtype=np.int64,
    )
    qy = np.array(
        [math.floor(math.log2(cnt) * 1e6 + 0.5) for _, cnt in top],
        dtype=np.int64,
    )
    n = len(top)
    sx, sy = int(qx.sum()), int(qy.sum())
    sxx, sxy = int((qx * qx).sum()), int((qx * qy).sum())
    slope = (n * 1.0 * sxy - sx * 1.0 * sy) / (n * 1.0 * sxx - sx * 1.0 * sx)
    intercept = (sy * 1.0 - slope * sx) / (n * 1.0) / 1e6
    return n, round(slope, 6), round(intercept, 6)


def test_matches_numpy_reference(spark):
    # A deliberately Zipf-ish corpus: word_i appears ~N/i times.
    texts = []
    for i in range(1, 60):
        texts.append(" ".join(f"word{j}" for j in range(1, 60) for _ in range(60 // j) if j <= i))
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    row = zipf_slope_stats(df).collect()[0]
    n, slope, intercept = _py_ref(texts)
    assert row["n_terms"] == n
    assert row["zipf_slope"] == slope
    assert row["intercept_log2"] == intercept
    # sanity: a 1/rank-ish corpus should slope downward
    assert slope < 0


def test_degenerate_single_word(spark):
    df = spark.createDataFrame([("hello hello hello",)], ["text"])
    row = zipf_slope_stats(df).collect()[0]
    assert row["n_terms"] == 1
    assert row["zipf_slope"] == 0.0


def test_topk_cut_is_take_ordered(spark):
    df = spark.createDataFrame([("a b c a b a",)], ["text"])
    plan = (
        zipf_slope_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
