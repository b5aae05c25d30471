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


# ---------------------------------------------------------------------------
# token_budget_select — greedy per-group budget fill


def test_token_budget_frontier_exact(spark):
    from pyspark.sql import functions as F

    from data_quality_automated_evaluator_spark.operators.sampling import (
        token_budget_select,
    )

    rows = [
        # (doc_id, source, priority, tokens) — srcA fills 10 exactly
        (1, "A", 50, 6),
        (2, "A", 40, 4),   # cum=10 == budget → keep (inclusive frontier)
        (3, "A", 30, 1),   # cum=11 → drop
        (4, "B", 10, 20),  # first row already over budget → drop
        (5, "B", 5, 3),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "pri", "tok"])
    out = token_budget_select(
        df, "source", "pri", "doc_id", F.col("tok"), budget=10
    )
    got = {r["doc_id"]: (r["cum_tokens"], r["keep"]) for r in out.collect()}
    assert got == {
        1: (6, True),
        2: (10, True),
        3: (11, False),
        4: (20, False),
        5: (23, False),
    }


def test_token_budget_priority_tiebreak_on_key(spark):
    from pyspark.sql import functions as F

    from data_quality_automated_evaluator_spark.operators.sampling import (
        token_budget_select,
    )

    rows = [(2, "A", 7, 5), (1, "A", 7, 5), (3, "A", 7, 5)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "pri", "tok"])
    out = token_budget_select(
        df, "source", "pri", "doc_id", F.col("tok"), budget=10
    )
    got = {r["doc_id"]: r["keep"] for r in out.collect()}
    # equal priority → doc_id ascending fills the budget
    assert got == {1: True, 2: True, 3: False}
