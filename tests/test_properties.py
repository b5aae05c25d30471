"""Property-based tests (hypothesis) for the pure scoring/parsing cores."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_automated_evaluator_spark.functions.intervals import parse_interval
from data_quality_automated_evaluator_spark.functions.perplexity import perplexity_batch
from data_quality_automated_evaluator_spark.functions.scrub import scrub_batch, scrub_text
from data_quality_automated_evaluator_spark.functions.langid import langid_label

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=300
)


@given(st.integers(1, 500), st.sampled_from(["s", "m", "h", "d", "w"]))
def test_interval_parser_fixed_units(n, unit):
    kind, secs = parse_interval(f"{n}{unit}")
    assert kind == "seconds"
    per = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}[unit]
    assert secs == n * per


@given(st.lists(TEXT, min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_scrub_idempotent_and_batch_consistent(texts):
    s = pd.Series(texts, dtype=object)
    once = scrub_batch(s)
    twice = scrub_batch(once)
    assert (once.fillna("@") == twice.fillna("@")).all()
    # batch result == single-string result
    for t, b in zip(texts, once):
        assert scrub_text(t) == b


@given(st.lists(TEXT, min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_perplexity_total_and_batch_invariant(texts):
    s = pd.Series(texts, dtype=object)
    p = perplexity_batch(s)
    assert len(p) == len(s)
    assert (p > 0).all() and np.isfinite(p).all()
    # splitting the batch never changes scores
    half = len(s) // 2
    if half:
        p2 = pd.concat([perplexity_batch(s.iloc[:half]), perplexity_batch(s.iloc[half:])])
        assert (p.values == p2.values).all()


@given(st.lists(TEXT, min_size=1, max_size=20))
@settings(max_examples=30, deadline=None)
def test_langid_total(texts):
    s = pd.Series(texts, dtype=object)
    labels = langid_label(s)
    assert set(labels) <= {"en", "fr", "de", "ru", "zh", "und"}
    assert len(labels) == len(s)


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_scrub_removes_all_pii_patterns(text):
    import re

    out = scrub_text(text + " a@b.co 4111111111111111 10.1.2.3")
    assert "4111111111111111" not in out
    assert re.search(r"\b(?:\d{1,3}\.){3}\d{1,3}\b", out) is None
