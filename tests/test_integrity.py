"""Referential-integrity audit — orphan/null accounting on a corpus
with planted violations, plus the broadcast plan gate."""

from __future__ import annotations

from data_quality_automated_evaluator_spark.operators.integrity import (
    _edge_stats,
)


def test_planted_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None), (5, 99), (6, 20)],
        ["id", "fk"],
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], ["pk"])
    row = _edge_stats("child.fk->parent", child, "fk", parent, "pk", True)
    out = row.collect()[0]
    assert out["edge"] == "child.fk->parent"
    assert out["n_child"] == 6
    assert out["n_null_fk"] == 1
    assert out["n_orphans"] == 2  # the two fk=99 rows; NULL is not an orphan
    assert out["orphan_rate"] == round(2 / 6, 6)


def test_clean_edge_zero_orphans(spark):
    child = spark.createDataFrame([(1, 10), (2, 10)], ["id", "fk"])
    parent = spark.createDataFrame([(10,)], ["pk"])
    out = _edge_stats("e", child, "fk", parent, "pk", False).collect()[0]
    assert out["n_orphans"] == 0
    assert out["orphan_rate"] == 0.0


def test_dimension_parent_is_broadcast(spark):
    child = spark.createDataFrame([(1, 10)], ["id", "fk"])
    parent = spark.createDataFrame([(10,)], ["pk"])
    df = _edge_stats("e", child, "fk", parent, "pk", True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
