"""Logistic-regression quality classifier (functions/classifier.py):
training learns the distilled rule, scoring threshold semantics,
partitioning invariance of the trained weights, validation."""

from __future__ import annotations

import pytest

from data_quality_automated_evaluator_spark.functions.classifier import (
    lr_score,
    lr_train,
    lr_train_stats,
)


def _docs(spark, n=300):
    # token counts 10..109 -> label (>= 50 tokens) splits the set evenly
    rows = [(i, " ".join(f"w{j}" for j in range(10 + i % 100))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_training_learns_token_rule(spark):
    df = _docs(spark)
    stats = lr_train_stats(df, lr=8.0, iters=6).collect()[0]
    assert stats["n"] == 300
    # the token-count feature must dominate and accuracy must be high
    assert stats["w2"] > 1.0
    assert stats["train_acc"] >= 0.9


def test_weights_partitioning_invariant(spark):
    df = _docs(spark, 200)
    w_a = lr_train(df, lr=8.0, iters=3)
    w_b = lr_train(df.repartition(11), lr=8.0, iters=3)
    # engine-side 6dp rounding pins the trajectory across partitionings
    assert w_a == w_b


def test_scoring_threshold_and_validation(spark):
    df = _docs(spark, 100)
    out = lr_score(df, [0.0, 0.0, 8.0, 0.0]).collect()
    for r in out:
        n_tok = len(r["text"].split())
        assert r["keep"] == (n_tok >= 50)
        assert 0.0 <= r["score"] <= 1.0
    with pytest.raises(ValueError):
        lr_score(df, [0.0, 1.0])
    with pytest.raises(ValueError):
        lr_train(df, iters=0)
