"""Embedding health audit (operators/embhealth.py): numpy parity on a
planted-defect frame, zero/NaN classification, collapse-ratio endpoints,
partition invariance, and the map-only + one-Exchange plan shape."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.embhealth import (
    embedding_health,
)

DIM = 8
MICRO = 1_000_000


def _df(spark, rows):
    return spark.createDataFrame(
        [(g, [float(x) for x in v]) for g, v in rows],
        f"label int, embedding array<float>",
    )


def _numpy_ref(rows):
    """Pure-numpy reference replaying the operator's quantized math."""
    out = {}
    for g in sorted({g for g, _ in rows}):
        vs = [np.asarray(v, dtype=np.float32) for gg, v in rows if gg == g]
        bad = [bool(np.isnan(v).any()) for v in vs]
        n2 = [float(np.sum(v.astype(np.float64) ** 2)) for v in vs]
        healthy = [not b and x > 0 for b, x in zip(bad, n2)]
        hv = [v for v, h in zip(vs, healthy) if h]
        nh = len(hv)
        qn = sum(
            int(np.round(math.sqrt(x) * MICRO))
            for x, h in zip(n2, healthy)
            if h
        )
        if nh:
            avg = qn / nh / MICRO
            s = [
                sum(int(np.round(float(v[i]) * MICRO)) for v in hv)
                for i in range(DIM)
            ]
            mean2 = sum((si / nh / MICRO) ** 2 for si in s)
            collapse = round(math.sqrt(mean2) / avg, 6)
            avg = round(avg, 6)
            mn = round(min(math.sqrt(x) for x, h in zip(n2, healthy) if h), 6)
            mx = round(max(math.sqrt(x) for x, h in zip(n2, healthy) if h), 6)
        else:
            avg = collapse = mn = mx = None
        out[g] = dict(
            n_vecs=len(vs),
            n_zero=sum(1 for b, x in zip(bad, n2) if not b and x == 0),
            n_nonfinite=sum(bad),
            avg_norm=avg,
            min_norm=mn,
            max_norm=mx,
            collapse_ratio=collapse,
        )
    return out


@pytest.fixture(scope="module")
def rows():
    rng = np.random.default_rng(11)
    rows = [(i % 3, rng.normal(size=DIM)) for i in range(60)]
    rows.append((0, np.zeros(DIM)))  # dead-zero vector
    nanv = rng.normal(size=DIM)
    nanv[3] = np.nan
    rows.append((1, nanv))  # non-finite vector
    return rows


def test_matches_numpy(spark, rows):
    got = {
        r["label"]: r
        for r in (
            embedding_health(_df(spark, rows), "embedding", "label", dim=DIM)
            .collect()
        )
    }
    ref = _numpy_ref(rows)
    assert set(got) == set(ref)
    for g, exp in ref.items():
        row = got[g]
        for k in ("n_vecs", "n_zero", "n_nonfinite"):
            assert row[k] == exp[k], (g, k)
        for k in ("avg_norm", "min_norm", "max_norm", "collapse_ratio"):
            assert row[k] == pytest.approx(exp[k], abs=2e-6), (g, k)
    # the planted defects are counted, not vacuous
    assert got[0]["n_zero"] == 1 and got[1]["n_nonfinite"] == 1


def test_collapse_endpoints(spark):
    # identical vectors -> collapse_ratio == 1
    same = [(0, [1.0, 2.0] + [0.0] * (DIM - 2))] * 5
    # antipodal pairs -> mean vector 0 -> collapse_ratio == 0
    anti = [(1, [1.0] * DIM), (1, [-1.0] * DIM)] * 3
    out = {
        r["label"]: r
        for r in embedding_health(
            _df(spark, same + anti), "embedding", "label", dim=DIM
        ).collect()
    }
    assert out[0]["collapse_ratio"] == pytest.approx(1.0, abs=1e-5)
    assert out[1]["collapse_ratio"] == pytest.approx(0.0, abs=1e-5)


def test_all_dead_group_is_null_not_error(spark):
    rows = [(0, [0.0] * DIM), (0, [0.0] * DIM)]
    row = embedding_health(
        _df(spark, rows), "embedding", "label", dim=DIM
    ).collect()[0]
    assert row["n_zero"] == 2
    assert row["avg_norm"] is None and row["collapse_ratio"] is None


def test_partition_invariance(spark, rows):
    df = _df(spark, rows)
    a = embedding_health(df.coalesce(1), "embedding", "label", dim=DIM)
    b = embedding_health(
        df.repartition(13, "embedding"), "embedding", "label", dim=DIM
    )
    assert [r.asDict() for r in a.collect()] == [
        r.asDict() for r in b.collect()
    ]


def test_plan_one_exchange_no_python(spark, rows):
    plan = embedding_health(
        _df(spark, rows), "embedding", "label", dim=DIM
    )._jdf.queryExecution().executedPlan().toString()
    # one partial->final HashAggregate pair over ONE exchange (plus the
    # final orderBy range exchange); no posexplode, no Python workers
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Generate" not in plan and "explode" not in plan.lower()
    assert "Python" not in plan and "ArrowEval" not in plan
