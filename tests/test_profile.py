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
