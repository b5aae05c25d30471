"""Encoding-health audit — per-signal counts on planted defects and the
clean-corpus zero case."""

from __future__ import annotations

from data_quality_automated_evaluator_spark.functions.encoding import (
    MOJI_SUFFIX,
    REPL_SUFFIX,
    encoding_audit,
)


def test_clean_ascii_corpus_all_zero(spark):
    df = spark.createDataFrame(
        [("s", "hello world"), ("s", "plain ascii text")], ["source", "text"]
    )
    r = encoding_audit(df).collect()[0]
    assert r["repl_chars"] == 0
    assert r["moji_hits"] == 0
    assert r["c1_chars"] == 0
    assert r["non_ascii_chars"] == 0
    assert r["ascii_ratio"] == 1.0
    assert r["suspect_docs"] == 0


def test_planted_defects_counted_per_signal(spark):
    rows = [
        ("s", "ok"),                           # clean
        ("s", "x" + REPL_SUFFIX),              # one U+FFFD
        ("s", "y" + MOJI_SUFFIX),              # 3 mojibake digraph hits
        ("s", "z\u0085\u0096"),                # two C1 controls
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    r = encoding_audit(df).collect()[0]
    assert r["n_docs"] == 4
    assert r["repl_chars"] == 1
    assert r["moji_hits"] == 3  # Ã¯, â€, Ã© in the suffix
    assert r["c1_chars"] == 2
    assert r["suspect_docs"] == 3
    assert r["non_ascii_chars"] > 0
    assert 0.0 < r["ascii_ratio"] < 1.0


def test_groups_isolated(spark):
    df = spark.createDataFrame(
        [("a", "clean"), ("b", "bad �")], ["source", "text"]
    )
    rows = {r["source"]: r for r in encoding_audit(df).collect()}
    assert rows["a"]["suspect_docs"] == 0
    assert rows["b"]["suspect_docs"] == 1
    assert rows["b"]["repl_chars"] == 1
