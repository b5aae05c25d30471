"""Golden gate (BASELINE north_rule): Spark quality pipeline vs the
single-node pandas oracle on the deterministic transcripts fixture —
keep/drop F1 ≥ 0.99 and byte-exact scrubbed text under stable
(conv_id, turn_idx) ordering."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_quality_automated_evaluator_spark.pipeline.oracle import f1_score, oracle_quality
from data_quality_automated_evaluator_spark.pipeline.quality import run_quality_pipeline
from data_quality_automated_evaluator_spark.pipeline.rules import RULE_NAMES
from data_quality_automated_evaluator_spark.testdata import generate_transcripts

N_CONVS = 800  # ~few thousand turns — fast but covers every text kind


@pytest.fixture(scope="module")
def transcripts() -> pd.DataFrame:
    return generate_transcripts(n_convs=N_CONVS, seed=42)


@pytest.fixture(scope="module")
def spark_result(spark, transcripts):
    sdf = spark.createDataFrame(transcripts)
    res = run_quality_pipeline(sdf)
    pdf = res.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pdf


@pytest.fixture(scope="module")
def oracle_result(transcripts):
    return oracle_quality(transcripts)


def test_fixture_covers_kinds(transcripts):
    texts = transcripts["text"]
    assert (texts.str.contains("@example.com")).any()
    assert (texts.str.len() > 8000).any()
    assert (texts == "").any()
    langs = transcripts["text"].str.contains("модель")
    assert langs.any()


def test_keep_f1(spark_result, oracle_result):
    assert len(spark_result) == len(oracle_result)
    assert (spark_result["conv_id"].values == oracle_result["conv_id"].values).all()
    assert (spark_result["turn_idx"].values == oracle_result["turn_idx"].values).all()
    f1 = f1_score(oracle_result["keep"], spark_result["keep"])
    exact = (spark_result["keep"].values == oracle_result["keep"].values).mean()
    assert f1 >= 0.99, f"keep/drop F1 {f1:.5f} < 0.99 (exact agreement {exact:.5f})"


def test_rule_flags_agree(spark_result, oracle_result):
    """Stronger than F1: every individual rule flag agrees (diagnosable)."""
    for r in RULE_NAMES:
        agree = (
            spark_result[r].astype(bool).values == oracle_result[r].astype(bool).values
        )
        assert agree.mean() > 0.999, (
            f"rule {r}: {100 * (1 - agree.mean()):.3f}% disagreement; "
            f"first idx {np.nonzero(~agree)[0][:5]}"
        )


def test_scrub_byte_exact(spark_result, oracle_result):
    a = spark_result["text_scrubbed"].fillna("").tolist()
    b = oracle_result["text_scrubbed"].fillna("").tolist()
    bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not bad, f"{len(bad)} scrub mismatches, first: {bad[:3]}"


def test_scrub_actually_scrubs(oracle_result):
    s = oracle_result["text_scrubbed"]
    joined = "\n".join(s.fillna(""))
    assert "@example.com" not in joined
    assert "<EMAIL>" in joined
    assert "<CARD>" in joined
    assert "<PHONE>" in joined
    assert "<IP>" in joined
    assert "<TOX>" in joined


def test_keep_rate_sane(oracle_result):
    rate = oracle_result["keep"].mean()
    assert 0.3 < rate < 0.95, f"keep rate {rate:.3f} suspicious"
