"""temperature_mix_sample (operators/sampling.py) and resolve_best
(operators/components.py): rate math, determinism, alpha endpoints,
argmax-representative semantics, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.components import resolve_best
from data_quality_automated_evaluator_spark.operators.sampling import (
    _temp_rate_expr,
    balanced_mix_sample,
    temperature_mix_sample,
)


def _docs(spark, counts: dict[str, int]):
    rows, i = [], 0
    for lang, n in sorted(counts.items()):
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_alpha_one_keeps_everything(spark):
    df = _docs(spark, {"en": 400, "fr": 50})
    out = temperature_mix_sample(df, alpha=1.0)
    assert out.count() == 450


def test_alpha_zero_matches_balanced_mix(spark):
    df = _docs(spark, {"en": 400, "fr": 120, "de": 60})
    a0 = {r["doc_id"] for r in temperature_mix_sample(df, alpha=0.0).collect()}
    # balanced_mix keys its bucket on the same (stratum:key) concat, so
    # alpha=0 must reproduce its exact keep set, not just its size
    bal = {r["doc_id"] for r in balanced_mix_sample(df).collect()}
    assert a0 == bal


def test_rarest_stratum_passes_whole_and_rates_interpolate(spark):
    df = _docs(spark, {"en": 1600, "fr": 100})
    out = temperature_mix_sample(df, alpha=0.5)
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["fr"] == 100  # rate exactly 1
    # en rate = sqrt(100/1600) = 0.25 -> binomial noise around 400
    assert 320 <= by_lang["en"] <= 480


def test_determinism_and_subset_monotone_in_alpha(spark):
    df = _docs(spark, {"en": 800, "fr": 90})
    k1 = {r["doc_id"] for r in temperature_mix_sample(df, alpha=0.5).collect()}
    k2 = {r["doc_id"] for r in temperature_mix_sample(df, alpha=0.5).collect()}
    assert k1 == k2
    # same bucket hash, lower threshold => alpha=0 keep set is a subset
    k0 = {r["doc_id"] for r in temperature_mix_sample(df, alpha=0.0).collect()}
    assert k0 <= k1


def test_rate_expr_validation_and_sqrt_chain():
    with pytest.raises(ValueError):
        _temp_rate_expr(1.5, "m", "c")
    # the exact-alpha chain uses sqrt, not pow
    assert "pow" not in _temp_rate_expr(0.5, "m", "c")
    assert "pow" not in _temp_rate_expr(0.25, "m", "c")
    assert "pow" in _temp_rate_expr(0.9, "m", "c")
    # threshold value check: alpha=0.5, min=100, cnt=1600 -> floor(0.25*65536)
    assert math.floor(math.sqrt(100 / 1600) * 65536) == 16384


def test_no_data_sized_shuffle_in_mix_plan(spark):
    df = _docs(spark, {"en": 300, "fr": 40})
    plan = temperature_mix_sample(df, alpha=0.5)._jdf.queryExecution().toString()
    # keep decision joins a broadcast threshold frame: no sort-merge join
    assert "SortMergeJoin" not in plan


def test_resolve_best_keeps_argmax_with_min_id_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 7)],
        "doc_id long, score long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r.asDict() for r in
           resolve_best(docs, pairs, score_col="score").collect()}
    # cluster {1,2,3}: max score 30 shared by 2 and 3 -> min id 2 kept
    assert out[2]["keep"] and not out[1]["keep"] and not out[3]["keep"]
    assert out[1]["component"] == out[2]["component"] == out[3]["component"]
    # unpaired docs are their own representative
    assert out[4]["keep"] and out[4]["component"] == 4
    assert out[9]["keep"] and out[9]["component"] == 9
