"""Random projection (operators/projection.py): matrix determinism and
exactness, numpy parity, JL distance preservation, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.projection import (
    project_col,
    projection_matrix,
    random_projection,
)


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_matrix_deterministic_and_exact():
    a = projection_matrix(32, k=16, seed=7)
    b = projection_matrix(32, k=16, seed=7)
    assert a == b
    c = projection_matrix(32, k=16, seed=8)
    assert a != c
    flat = {abs(x) for row in a for x in row}
    assert flat == {0.25}  # exactly representable scale
    # signs are roughly balanced (md5 parity)
    n_pos = sum(1 for row in a for x in row if x > 0)
    assert 0.35 < n_pos / (32 * 16) < 0.65


def test_matrix_k_validation():
    with pytest.raises(ValueError, match="power of 4"):
        projection_matrix(32, k=8)
    with pytest.raises(ValueError, match="power of 4"):
        projection_matrix(32, k=9)  # square but root not a power of 2


def test_projection_matches_numpy(spark):
    rng = np.random.RandomState(5)
    vecs = rng.rand(30, 32).round(4).tolist()
    df = _vec_df(spark, vecs)
    m = projection_matrix(32, k=16, seed=3)
    got = {
        r["vec_id"]: list(r["p"])
        for r in df.select(
            "vec_id", project_col(m, F.col("embedding")).alias("p")
        ).collect()
    }
    M = np.array(m)
    for i, v in enumerate(vecs):
        want = (M @ np.array(v)).tolist()
        assert got[i] == pytest.approx(want, abs=1e-12)


def test_jl_distance_preservation(spark):
    # pairwise squared distances survive within JL tolerance on average
    rng = np.random.RandomState(9)
    vecs = rng.rand(40, 64).tolist()
    df = _vec_df(spark, vecs)
    out = {
        r["vec_id"]: np.array(r["proj"])
        for r in random_projection(df, k=16, dim=64).collect()
    }
    X = np.array(vecs)
    ratios = []
    for i in range(0, 40, 3):
        for j in range(i + 1, 40, 7):
            d_orig = ((X[i] - X[j]) ** 2).sum()
            d_proj = ((out[i] - out[j]) ** 2).sum()
            ratios.append(d_proj / d_orig)
    r = np.array(ratios)
    assert 0.85 < r.mean() < 1.15  # unbiased estimator, k=16 variance
    assert (r > 0.3).all() and (r < 2.0).all()


def test_projection_plan_is_map_only(spark):
    rng = np.random.RandomState(11)
    vecs = rng.rand(10, 16).round(4).tolist()
    df = _vec_df(spark, vecs)
    plan = (
        random_projection(df, k=4, dim=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
