"""Scalar int8 quantization (operators/quantize.py): bounds, encode
clamp/degenerate semantics, decode error bound, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.quantize import (
    sq_decode_col,
    sq_encode,
    sq_encode_col,
    sq_train,
)


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_bounds_match_numpy(spark):
    rng = np.random.RandomState(17)
    vecs = rng.rand(40, 8).round(4).tolist()
    df = _vec_df(spark, vecs)
    mins, maxes = sq_train(df)
    arr = np.array(vecs)
    assert mins == pytest.approx(np.round(arr.min(axis=0), 6).tolist())
    assert maxes == pytest.approx(np.round(arr.max(axis=0), 6).tolist())


def test_codes_in_range_and_extremes_hit_0_255(spark):
    vecs = [[0.0, 5.0], [10.0, 5.0], [5.0, 5.0]]
    df = _vec_df(spark, vecs)
    mins, maxes = sq_train(df)
    rows = sq_encode(df, mins, maxes).orderBy("vec_id").collect()
    codes = [list(r["codes"]) for r in rows]
    # dim 0 spans [0,10]: min row -> 0, max row -> 255, mid -> ~128
    assert codes[0][0] == 0 and codes[1][0] == 255
    assert codes[2][0] == 128  # round(0.5*255) = round(127.5) = 128
    # dim 1 degenerate (constant): always code 0
    assert [c[1] for c in codes] == [0, 0, 0]


def test_decode_error_bounded_by_half_step(spark):
    rng = np.random.RandomState(23)
    vecs = rng.rand(50, 8).round(4).tolist()
    df = _vec_df(spark, vecs)
    mins, maxes = sq_train(df)
    out = (
        df.select(
            "vec_id",
            F.col("embedding").alias("v"),
            sq_encode_col(mins, maxes, F.col("embedding")).alias("codes"),
        )
        .select(
            "vec_id", "v", sq_decode_col(mins, maxes, F.col("codes")).alias("rv")
        )
        .collect()
    )
    steps = [(mx - mn) / 255.0 for mn, mx in zip(mins, maxes)]
    for r in out:
        for x, y, st in zip(r["v"], r["rv"], steps):
            # half-step quantization error bound (+ rounding slack on
            # the 6dp bounds themselves)
            assert abs(x - y) <= st / 2 + 2e-6


def test_mse_matches_manual(spark):
    rng = np.random.RandomState(29)
    vecs = rng.rand(20, 4).round(4).tolist()
    df = _vec_df(spark, vecs)
    mins, maxes = sq_train(df)
    rows = sq_encode(df, mins, maxes).orderBy("vec_id").collect()
    for r in rows:
        dec = [
            mn + c / 255.0 * (mx - mn)
            for c, mn, mx in zip(r["codes"], mins, maxes)
        ]
        v = vecs[r["vec_id"]]
        want = sum((a - b) ** 2 for a, b in zip(v, dec)) / len(v)
        assert r["recon_mse"] == pytest.approx(want, abs=2e-6)


def test_encode_plan_is_map_only(spark):
    rng = np.random.RandomState(31)
    vecs = rng.rand(10, 4).round(4).tolist()
    df = _vec_df(spark, vecs)
    mins, maxes = sq_train(df)
    plan = (
        sq_encode(df, mins, maxes)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
