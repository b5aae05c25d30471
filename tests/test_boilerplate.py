"""boilerplate_fraction (operators/dedup.py): hand-computable pins,
digest-vs-raw parity with the DuckDB oracle, shuffle payload shape."""

from __future__ import annotations

import duckdb
import pytest

from data_quality_automated_evaluator_spark.operators.dedup import (
    boilerplate_fraction,
    boilerplate_oracle_sql,
)


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_identical_docs_are_pure_boilerplate(spark):
    out = {
        r["doc_id"]: r.asDict()
        for r in boilerplate_fraction(
            _df(spark, [(1, "abcdefghij"), (2, "abcdefghij")]), k=8
        ).collect()
    }
    # 3 distinct 8-grams each, all shared
    assert out[1]["n_grams"] == 3 and out[1]["boilerplate_frac"] == 1.0
    assert out[2]["boilerplate_frac"] == 1.0


def test_disjoint_docs_are_fully_novel(spark):
    out = {
        r["doc_id"]: r["boilerplate_frac"]
        for r in boilerplate_fraction(
            _df(spark, [(1, "aaaaaaaaaa"), (2, "bbbbbbbbbb")]), k=8
        ).collect()
    }
    assert out == {1: 0.0, 2: 0.0}


def test_partial_overlap_exact_fraction(spark):
    # doc1: "XXXXXXXXabc" grams: XXXXXXXX, XXXXXXXa, XXXXXXab, XXXXXabc
    # doc2: "XXXXXXXXdef" shares exactly the XXXXXXXX gram
    out = {
        r["doc_id"]: r.asDict()
        for r in boilerplate_fraction(
            _df(spark, [(1, "XXXXXXXXabc"), (2, "XXXXXXXXdef")]), k=8
        ).collect()
    }
    assert out[1]["n_grams"] == 4
    assert out[1]["boilerplate_frac"] == 0.25
    assert out[2]["boilerplate_frac"] == 0.25


def test_short_doc_is_one_gram(spark):
    out = boilerplate_fraction(_df(spark, [(1, "hi")]), k=8).collect()
    assert out[0]["n_grams"] == 1 and out[0]["boilerplate_frac"] == 0.0


def test_matches_duckdb_raw_gram_oracle(spark):
    docs = [
        (i, f"common prefix shared by all docs, unique tail {i}^{i * 7}")
        for i in range(30)
    ] + [(100, "entirely different content with no overlap whatsoever")]
    got = {
        r["doc_id"]: (r["n_grams"], r["boilerplate_frac"])
        for r in boilerplate_fraction(_df(spark, docs), k=8).collect()
    }
    con = duckdb.connect()
    con.execute("SET threads=1")
    base = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in docs
    )
    ora = con.execute(boilerplate_oracle_sql(base, k=8)).df()
    want = {
        int(r.doc_id): (int(r.n_grams), float(r.boilerplate_frac))
        for r in ora.itertuples()
    }
    assert got == want


def test_no_raw_text_in_shuffle_plan(spark):
    df = _df(spark, [(1, "abcdefghij"), (2, "abcdefghij")])
    plan = boilerplate_fraction(df, k=8)._jdf.queryExecution().toString()
    # grams shuffle as xxhash64 longs; the substring explode must happen
    # before the first Exchange, not travel through it
    assert "xxhash64" in plan
