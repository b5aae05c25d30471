"""operators/lm: distributed bigram-LM training + broadcast scoring."""

from __future__ import annotations

import numpy as np
import pandas as pd

from data_quality_automated_evaluator_spark.functions.perplexity import (
    _BYTE_CLASS,
    _CORPUS,
    _LOGP,
    V,
    perplexity_batch,
)
from data_quality_automated_evaluator_spark.operators.lm import (
    corpus_lm_scores,
    ppl_under_lm,
    train_bigram_lm,
)

from pyspark.sql import functions as F


def _direct_counts(texts: list[str], prefix: int | None) -> np.ndarray:
    counts = np.zeros((V, V), dtype=np.float64)
    for t in texts:
        t = (t or "")[:prefix] if prefix is not None else (t or "")
        t = t.replace("\x00", "")
        b = np.frombuffer(t.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        if len(b) >= 2:
            c = _BYTE_CLASS[b]
            np.add.at(counts, (c[:-1], c[1:]), 1.0)
    return counts


def test_trainer_matches_direct_counts(spark):
    texts = [
        "the quick brown fox",
        "jumps over the lazy dog",
        "ünïcode bytes fall into the oov class",
        "",
        None,
        "x" * 1500,  # prefix truncation applies
    ]
    df = spark.createDataFrame(
        [(t,) for t in texts], "text string"
    ).repartition(3)  # counts must merge across partitions
    logp = train_bigram_lm(df, "text")
    counts = _direct_counts(texts, 1000)
    expected = np.log((1.0 + counts) / (V + counts.sum(axis=1, keepdims=True)))
    np.testing.assert_array_equal(logp, expected)


def test_trainer_reproduces_embedded_lm(spark):
    # training on exactly the embedded corpus (untruncated) must rebuild
    # the embedded matrix bit-for-bit — same integer counts, same algebra
    df = spark.createDataFrame([(_CORPUS,)], "text string")
    logp = train_bigram_lm(df, "text", prefix=None)
    np.testing.assert_array_equal(logp, _LOGP)


def test_scoring_under_embedded_lm_matches_scorer(spark):
    texts = ["the cat sat on the mat", "zzzz qqqq", ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["p"]
        for r in df.select(ppl_under_lm(_LOGP, F.col("text")).alias("p"))
        .collect()
    ]
    want = perplexity_batch(pd.Series(texts)).tolist()
    assert got == want


def test_self_scored_corpus_lm_prefers_in_domain_text(spark):
    rows = [(i, "spark jobs shuffle partitions and broadcast joins") for i in range(8)]
    rows += [(100, "乱码 ✦✦ βγδ ×÷ mixed junk"), (101, "qqq zzz jjj xxx vvv")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["ppl"] for r in corpus_lm_scores(df).collect()}
    in_domain = max(out[i] for i in range(8))
    assert in_domain < out[100] and in_domain < out[101]


def test_grouped_lms_match_per_group_training(spark):
    from data_quality_automated_evaluator_spark.operators.lm import (
        train_grouped_lms,
    )

    rows = [
        ("en", "the quick brown fox jumps"),
        ("en", "over the lazy dog"),
        ("xx", "zzzz qqqq jjjj"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string").repartition(2)
    lms = train_grouped_lms(df, "lang")
    for g in ("en", "xx"):
        counts = _direct_counts([t for l, t in rows if l == g], 1000)
        expected = np.log(
            (1.0 + counts) / (V + counts.sum(axis=1, keepdims=True))
        )
        np.testing.assert_array_equal(lms[g], expected)


def test_grouped_scores_use_own_group_lm(spark):
    from data_quality_automated_evaluator_spark.operators.lm import (
        grouped_lm_scores,
    )

    rows = [
        (0, "en", "the cat"),
        (1, "xx", "the cat"),
        (2, "xx", "zzz qqq zzz qqq"),  # skews the xx LM away from en's
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r["ppl"] for r in grouped_lm_scores(df, "lang").collect()}
    # the same text scored under differently-trained LMs must differ
    assert out[0] != out[1]
