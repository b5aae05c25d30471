"""Readability (Flesch reading-ease) — pure-Python reference parity
plus the pinned edge cases the vowel-group heuristic must honor."""

from __future__ import annotations

import re

import pytest

from data_quality_automated_evaluator_spark.functions.readability import (
    readability_stats,
)


def _py_ref(text: str):
    words = [w for w in re.split(r"[^a-z]+", text.lower()) if w]
    n_words = len(words)
    n_syll = sum(
        max(1, len(re.findall(r"[aeiouy]+", w))) for w in words
    )
    n_sent = len(
        [s for s in re.split(r"[.!?]+", text) if s.strip() != ""]
    )
    if n_words == 0:
        return 0, n_sent, 0, 0.0, "empty"
    flesch = round(
        206.835
        - 1.015 * (n_words * 1.0 / max(1, n_sent))
        - 84.6 * (n_syll * 1.0 / n_words),
        6,
    )
    band = (
        "easy" if flesch >= 60.0
        else "standard" if flesch >= 30.0
        else "difficult"
    )
    return n_words, n_sent, n_syll, flesch, band


CASES = [
    "The cat sat on the mat. It was happy!",
    "Incomprehensibilities notwithstanding, the institutionalization "
    "of multidimensional characterizations persists.",
    "",
    "!!! ...",
    "no terminator at all just words running on and on",
    "Rhythm myths.",  # zero-vowel words -> 1 syllable each
    "One. Two! Three? Four.",
    "a b c d e f",  # single-letter words
    "Tabs\tand\nnewlines. Second sentence here.",
]


@pytest.mark.parametrize("text", CASES)
def test_matches_python_reference(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = readability_stats(df).collect()[0]
    n_words, n_sent, n_syll, flesch, band = _py_ref(text)
    assert row["n_words"] == n_words
    assert row["n_sentences"] == n_sent
    assert row["n_syllables"] == n_syll
    assert row["flesch"] == pytest.approx(flesch, abs=1e-9)
    assert row["band"] == band


def test_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "Hi there.")], ["doc_id", "text"])
    plan = readability_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
