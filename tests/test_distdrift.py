"""Distribution drift (PSI / two-sample KS) — known-value checks against
pure-Python recomputation, alarm-flag semantics, and the broadcast plan
gate for the PSI bin-edge join."""

from __future__ import annotations

import datetime as dt
import math

from data_quality_automated_evaluator_spark.operators.distdrift import (
    KS_COEFF,
    ks_drift,
    psi_drift,
)


def _frame(spark, base_vals, cur_vals, group="a"):
    """One group: base_vals on day 5 (baseline half), cur_vals on day 25."""
    rows = [
        (group, float(v), dt.datetime(2024, 3, 5, 12, 0, 0)) for v in base_vals
    ] + [
        (group, float(v), dt.datetime(2024, 3, 25, 12, 0, 0)) for v in cur_vals
    ]
    return spark.createDataFrame(rows, ["g", "v", "ts"])


def _psi_expected(base, cur, bins=10):
    vmin, vmax = min(base + cur), max(base + cur)
    width = (vmax - vmin) / bins if vmax > vmin else None

    def bucket(v):
        if width is None:
            return 0
        return min(int(math.floor((v - vmin) * bins / (vmax - vmin))), bins - 1)

    cb = [0] * bins
    cc = [0] * bins
    for v in base:
        cb[bucket(v)] += 1
    for v in cur:
        cc[bucket(v)] += 1
    nb, nc = len(base), len(cur)
    psi = 0.0
    for b in range(bins):
        pb = (cb[b] + 0.5) / (nb + bins * 0.5)
        pc = (cc[b] + 0.5) / (nc + bins * 0.5)
        # mirror the operator's nano-quantization
        psi += round((pc - pb) * math.log(pc / pb) * 1e9)
    return round(psi / 1e9, 6)


def test_psi_identical_distributions_stable(spark):
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10] * 3
    out = psi_drift(_frame(spark, vals, vals), "v", "ts", "g").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_base"] == 30 and r["n_cur"] == 30
    assert abs(r["psi"]) < 1e-9
    assert r["drift"] is False


def test_psi_matches_pure_python_and_flags_shift(spark):
    base = [1, 1, 2, 2, 3, 3, 4, 4, 5, 5] * 4
    cur = [8, 8, 9, 9, 10, 10, 7, 7, 6, 6] * 4
    r = psi_drift(_frame(spark, base, cur), "v", "ts", "g").collect()[0]
    assert r["psi"] == _psi_expected(base, cur)
    assert r["psi"] > 0.2 and r["drift"] is True


def test_psi_constant_column_single_bucket(spark):
    r = psi_drift(_frame(spark, [5] * 8, [5] * 8), "v", "ts", "g").collect()[0]
    assert r["psi"] == 0.0 and r["drift"] is False


def test_psi_edges_join_is_broadcast(spark):
    df = psi_drift(_frame(spark, [1, 2], [3, 4]), "v", "ts", "g")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _ks_expected(base, cur):
    points = sorted(set(base) | set(cur))
    nb, nc = len(base), len(cur)
    gap = 0.0
    for p in points:
        fa = sum(1 for v in base if v <= p) / nb
        fb = sum(1 for v in cur if v <= p) / nc
        gap = max(gap, abs(fa - fb))
    return round(gap, 6)


def test_ks_matches_pure_python(spark):
    base = [1, 2, 2, 3, 5, 8, 9]
    cur = [4, 5, 6, 6, 7, 9, 9, 10]
    r = ks_drift(_frame(spark, base, cur), "v", "ts", "g").collect()[0]
    assert r["ks"] == _ks_expected(base, cur)
    assert r["n_base"] == 7 and r["n_cur"] == 8
    crit = KS_COEFF * math.sqrt(1.0 / 7 + 1.0 / 8)
    assert r["ks_crit"] == round(crit, 6)


def test_ks_identical_distributions_no_drift(spark):
    vals = list(range(40))
    r = ks_drift(_frame(spark, vals, vals), "v", "ts", "g").collect()[0]
    assert r["ks"] == 0.0 and r["drift"] is False


def test_ks_disjoint_supports_max_drift(spark):
    base = list(range(0, 30))
    cur = list(range(100, 130))
    r = ks_drift(_frame(spark, base, cur), "v", "ts", "g").collect()[0]
    assert r["ks"] == 1.0 and r["drift"] is True


def test_groups_are_independent(spark):
    df = _frame(spark, [1, 2, 3], [1, 2, 3], group="a").union(
        _frame(spark, [1, 1, 1], [9, 9, 9], group="b")
    )
    rows = {r["g"]: r for r in ks_drift(df, "v", "ts", "g").collect()}
    assert rows["a"]["ks"] == 0.0
    assert rows["b"]["ks"] == 1.0
