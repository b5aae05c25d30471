"""operators/nblangid: trained trigram Naive Bayes language-ID."""

from __future__ import annotations

from data_quality_automated_evaluator_spark.operators.nblangid import (
    nb_langid_confusion,
)


def test_nb_langid_separates_training_languages(spark):
    rows = []
    for i in range(12):
        rows.append(("en", f"the cat and the dog sat with the hat number {i}"))
        rows.append(("xx", f"zzq qqz zqz qzq zzq qqz zqz travnik {i}"))
    df = spark.createDataFrame(rows, "lang string, text string").repartition(3)
    out = {
        (r["lang"], r["pred"]): r["n"]
        for r in nb_langid_confusion(df, "lang", min_count=2).collect()
    }
    # self-classification must be diagonal: distinctive trigram mass
    assert out == {("en", "en"): 12, ("xx", "xx"): 12}


def test_nb_langid_fallback_is_prior_argmax(spark):
    # one doc too short to emit any trigram → falls back to the most
    # common label ('en' here), counted in the confusion matrix
    rows = [("en", "the cat and the dog and the cow")] * 3
    rows += [("xx", "zzq qqz zqz qzq zzq qqz")] * 2
    rows += [("xx", "ab")]  # < 3 chars: no trigram, true label xx
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {
        (r["lang"], r["pred"]): r["n"]
        for r in nb_langid_confusion(df, "lang", min_count=2).collect()
    }
    assert out[("xx", "en")] == 1  # the fallback row
    assert out[("en", "en")] == 3 and out[("xx", "xx")] == 2
