"""Distributed Lloyd's k-means (operators/kmeans.py): recovery of
separable clusters, partitioning invariance, single-iteration edge,
parameter validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.kmeans import (
    kmeans_assign_col,
    kmeans_fit,
    kmeans_stats,
)


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )


def test_recovers_separable_clusters(spark):
    # two tight blobs far apart in 2-d; init = first 2 vectors, which
    # land one in each blob -> Lloyd must converge to the blob means
    blob_a = [[0.0 + i * 0.01, 0.0] for i in range(10)]
    blob_b = [[10.0 + i * 0.01, 10.0] for i in range(10)]
    df = _vec_df(spark, [blob_a[0], blob_b[0]] + blob_a[1:] + blob_b[1:])
    cents = kmeans_fit(df, k=2, iters=3)
    assert len(cents) == 2
    # each centroid sits at its blob's mean (0.045, 0) / (10.045, 10)
    got = sorted(cents)
    assert got[0][0] == pytest.approx(0.045, abs=1e-6)
    assert got[0][1] == pytest.approx(0.0, abs=1e-6)
    assert got[1][0] == pytest.approx(10.045, abs=1e-6)
    assert got[1][1] == pytest.approx(10.0, abs=1e-6)


def test_assignment_ties_break_to_lowest_cell(spark):
    df = _vec_df(spark, [[0.0, 0.0]])
    # equidistant centroids -> cell 0 wins
    col = kmeans_assign_col([[1.0, 0.0], [-1.0, 0.0]], F.col("embedding"))
    assert df.select(col.alias("c")).collect()[0]["c"] == 0


def test_partitioning_invariance(spark):
    vecs = [[float(i % 7), float(i % 3)] for i in range(60)]
    df = _vec_df(spark, vecs)
    a = kmeans_stats(df, k=3, iters=2).orderBy("cell", "pos").collect()
    b = (
        kmeans_stats(df.repartition(13), k=3, iters=2)
        .orderBy("cell", "pos")
        .collect()
    )
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_single_iteration_and_validation(spark):
    df = _vec_df(spark, [[0.0, 0.0], [4.0, 0.0], [0.1, 0.0], [3.9, 0.0]])
    out = kmeans_stats(df, k=2, iters=1).orderBy("cell", "pos").collect()
    # assignment under the init centroids themselves:
    # cell0 = {v0, v2}, cell1 = {v1, v3}
    by = {(r["cell"], r["pos"]): r for r in out}
    assert by[(0, 0)]["n_members"] == 2
    assert by[(0, 0)]["centroid_val"] == pytest.approx(0.05, abs=1e-6)
    assert by[(1, 0)]["centroid_val"] == pytest.approx(3.95, abs=1e-6)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=2, iters=0)
