"""Split assignment + leakage audit (operators/splits.py): hash
stability, proportions, leak detection, digest-only plan."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.operators.splits import (
    split_column,
    split_leakage,
)

_HEX = "0123456789abcdef"


def _ref_split(key, train_pct=80, valid_pct=10):
    h = hashlib.md5(str(key).encode()).hexdigest()
    v = 0
    for c in h[:4]:
        v = v * 16 + _HEX.index(c)
    b = v % 100
    return "train" if b < train_pct else (
        "valid" if b < train_pct + valid_pct else "test"
    )


def test_split_matches_reference_hash_and_is_stable(spark):
    ids = list(range(1000))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", split_column(F.col("doc_id")).alias("s")
        ).collect()
    }
    assert got == {i: _ref_split(i) for i in ids}
    # row order / partitioning never changes the assignment
    got2 = {
        r["doc_id"]: r["s"]
        for r in df.repartition(7)
        .select("doc_id", split_column(F.col("doc_id")).alias("s"))
        .collect()
    }
    assert got2 == got
    # proportions roughly 80/10/10
    from collections import Counter

    c = Counter(got.values())
    assert 0.74 < c["train"] / 1000 < 0.86
    assert 0.05 < c["valid"] / 1000 < 0.16


def test_leakage_detects_cross_split_duplicates(spark):
    # find two ids in different splits, give them identical text
    a = next(i for i in range(100) if _ref_split(i) == "train")
    b = next(i for i in range(100) if _ref_split(i) == "test")
    c = next(i for i in range(100) if _ref_split(i) == "valid")
    rows = [(a, "same"), (b, "same"), (c, "unique")]
    out = {
        r["split"]: (r["n_docs"], r["n_leaked_docs"], r["n_leaked_digests"])
        for r in split_leakage(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
        ).collect()
    }
    assert out["train"] == (1, 1, 1)
    assert out["test"] == (1, 1, 1)
    assert out["valid"] == (1, 0, 0)


def test_same_split_duplicates_are_not_leaks(spark):
    ids = [i for i in range(200) if _ref_split(i) == "train"][:2]
    rows = [(ids[0], "dup"), (ids[1], "dup")]
    out = split_leakage(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id",
        "text",
    ).collect()
    assert all(r["n_leaked_docs"] == 0 for r in out)


def test_plan_shuffles_digests_only(spark):
    df = spark.createDataFrame([(1, "x" * 50)], "doc_id long, text string")
    out = split_leakage(df, "doc_id", "text")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Python" not in plan
    # text is projected away before both digest-keyed shuffles: the only
    # references above the first Project are id/split/digest
    import re

    exchanges = [
        ln for ln in plan.splitlines() if "text" in ln and "md5" not in ln
    ]
    assert not any("Join" in ln or "Aggregate" in ln for ln in exchanges)
