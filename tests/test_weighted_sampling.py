"""Weighted deterministic sampling (operators/sampling.weighted_take)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.sampling import weighted_take


def _docs(spark, n=400, parts=1):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 20 + 1).cast("long").alias("w"),
    )
    return df.repartition(parts)


def test_size_and_no_replacement(spark):
    out = weighted_take(_docs(spark), 50, "w").collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == 50 and len(set(ids)) == 50


def test_partitioning_invariance(spark):
    a = {r["doc_id"] for r in weighted_take(_docs(spark, parts=1), 50, "w").collect()}
    b = {r["doc_id"] for r in weighted_take(_docs(spark, parts=7), 50, "w").collect()}
    assert a == b


def test_weight_bias(spark):
    # 200 light rows (w=1) vs 200 heavy rows (w=50): the heavy half must
    # dominate a 100-row take (expected ~98 heavy; generous bound)
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, F.lit(1)).otherwise(F.lit(50)).alias("w"),
    )
    heavy = sum(
        1 for r in weighted_take(df, 100, "w").collect() if r["doc_id"] >= 200
    )
    assert heavy > 80


def test_nonpositive_weights_excluded(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 5, F.lit(0)).otherwise(F.lit(3)).alias("w"),
    )
    ids = {r["doc_id"] for r in weighted_take(df, 10, "w").collect()}
    assert ids == set(range(5, 10))


def test_priority_matches_python_reference(spark):
    # the emitted set equals a NumPy-free Python re-derivation of the
    # A-ES priorities (same md5 bucket, same formula)
    import hashlib

    rows = _docs(spark).collect()

    def prio(doc_id, w):
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
        return round(-math.log((2 * b + 1) / 131072.0) / w, 9)

    want = sorted(rows, key=lambda r: (prio(r["doc_id"], r["w"]), r["doc_id"]))
    want_ids = {r["doc_id"] for r in want[:50]}
    got_ids = {r["doc_id"] for r in weighted_take(_docs(spark), 50, "w").collect()}
    assert got_ids == want_ids


def test_plan_is_take_ordered(spark):
    plan = (
        weighted_take(_docs(spark), 50, "w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
