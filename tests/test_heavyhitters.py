"""Heavy hitters (operators/heavyhitters.py): exactness vs a Counter
reference under adversarial partitioning and tiny sketch caps."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from data_quality_automated_evaluator_spark.operators.heavyhitters import (
    heavy_hitters_exact,
)


def _ref(texts, k):
    words = []
    for t in texts:
        words += [w for w in "".join(
            c if c.isalnum() else " " for c in t.lower()
        ).split() if w]
    n = len(words)
    c = Counter(words)
    return {
        w: (cnt, round(cnt / n, 6))
        for w, cnt in c.items()
        if cnt > n / k
    }


def test_exact_vs_counter_small_cap_many_partitions(spark):
    rng = random.Random(13)
    vocab = [f"tok{i}" for i in range(300)]
    # skewed corpus: a few hot terms + long tail
    texts = []
    for _ in range(400):
        words = (
            ["hot"] * rng.randint(0, 6)
            + ["warm"] * rng.randint(0, 3)
            + rng.choices(vocab, k=rng.randint(5, 30))
        )
        rng.shuffle(words)
        texts.append(" ".join(words))
    df = spark.createDataFrame(
        [(t,) for t in texts], "text string"
    ).repartition(16)  # adversarial: candidates must merge across parts
    got = {
        r["w"]: (r["n"], r["freq"])
        for r in heavy_hitters_exact(df, "text", k=50, cap=64).collect()
    }
    assert got == _ref(texts, 50)
    assert "hot" in got  # the planted hitter is found


def test_cap_below_k_rejected(spark):
    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, "text", k=100, cap=50)


def test_threshold_is_strict(spark):
    # 10 tokens, k=5 -> threshold n > 2: 'a' (3) in, 'b' (2) out
    df = spark.createDataFrame(
        [("a a a b b c d e f g",)], "text string"
    )
    got = {r["w"]: r["n"] for r in heavy_hitters_exact(df, "text", k=5).collect()}
    assert got == {"a": 3}


def test_candidates_broadcast_in_plan(spark):
    df = spark.createDataFrame([("x y z",)], "text string")
    plan = (
        heavy_hitters_exact(df, "text", k=10)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the recount is gated by a broadcast of the candidate set, and the
    # only Python in the plan is the Arrow-batched MG sketch
    assert "broadcast" in plan.lower()
    assert plan.count("MapInPandas") == 1
