"""Whole-table profiling (operators/profile.py): metric correctness on
a hand-built table, complex-type degradation, single-pass plan, and the
exact-vs-approx Expand tradeoff."""

from __future__ import annotations

import contextlib
import io

import pytest

from data_quality_automated_evaluator_spark.operators.profile import profile_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def table(spark):
    return spark.createDataFrame(
        [
            (1, "a", 2.0, ["x"]),
            (2, "a", None, []),
            (3, None, 8.0, None),
        ],
        "id long, s string, v double, arr array<string>",
    )


def test_profile_metrics(table):
    got = {
        (r["column"], r["metric"]): r["value"]
        for r in profile_table(table).collect()
    }
    assert got[("id", "n_nonnull")] == 3.0
    assert got[("id", "n_null")] == 0.0
    assert got[("id", "n_distinct")] == 3.0
    assert got[("id", "min")] == 1.0 and got[("id", "max")] == 3.0
    assert got[("id", "mean")] == 2.0
    assert got[("s", "n_null")] == 1.0
    assert got[("s", "n_distinct")] == 1.0  # distinct ignores NULL
    assert got[("v", "n_nonnull")] == 2.0
    assert got[("v", "mean")] == 5.0
    # complex type: presence metrics only
    assert got[("arr", "n_null")] == 1.0
    assert ("arr", "n_distinct") not in got
    assert ("arr", "min") not in got


def test_profile_column_subset_and_validation(table):
    rows = profile_table(table, columns=["id"]).collect()
    assert {r["column"] for r in rows} == {"id"}
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(table, columns=["nope"])


def test_single_scan_and_approx_drops_expand(table):
    import re

    exact = _plan(profile_table(table))
    # one scan feeding one partial/final aggregate pair; exact distinct
    # over several columns requires Expand
    assert len(re.findall(r"\(\d+\) Scan", exact)) == 1
    assert "Expand" in exact
    approx = _plan(profile_table(table, approx=True))
    assert "Expand" not in approx


# ---------------------------------------------------------------------------
# freshness_audit — stale-source detection


def test_freshness_flags_stale_group(spark):
    import datetime as dt

    from data_quality_automated_evaluator_spark.operators.profile import (
        freshness_audit,
    )

    wm = dt.datetime(2024, 6, 10, 12, 0, 0)
    rows = [
        ("live", wm, 1),
        ("live", wm - dt.timedelta(hours=2), 2),
        ("lagging", wm - dt.timedelta(hours=23), 3),
        ("stale", wm - dt.timedelta(hours=25), 4),
    ]
    df = spark.createDataFrame(rows, ["src", "ts", "id"])
    out = {r["src"]: r for r in freshness_audit(df, "ts", "src").collect()}
    assert out["live"]["lag_hours"] == 0.0 and out["live"]["stale"] is False
    assert out["live"]["n_rows"] == 2
    assert out["lagging"]["lag_hours"] == 23.0
    assert out["lagging"]["stale"] is False  # 24h threshold exclusive
    assert out["stale"]["lag_hours"] == 25.0 and out["stale"]["stale"] is True


def test_freshness_subsecond_lag_truncates_to_seconds(spark):
    import datetime as dt

    from data_quality_automated_evaluator_spark.operators.profile import (
        freshness_audit,
    )

    wm = dt.datetime(2024, 6, 10, 12, 0, 0, 900000)
    rows = [("a", wm, 1), ("b", wm - dt.timedelta(seconds=1, microseconds=800000), 2)]
    df = spark.createDataFrame(rows, ["src", "ts", "id"])
    out = {r["src"]: r for r in freshness_audit(df, "ts", "src").collect()}
    # whole-second truncation on both endpoints: 12:00:00.9 vs 11:59:59.1
    # → trunc 12:00:00 − 11:59:59 = 1 s exactly
    assert out["b"]["lag_hours"] == round(1 / 3600.0, 6)
