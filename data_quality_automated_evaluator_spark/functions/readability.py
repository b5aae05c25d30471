"""Readability scoring: Flesch reading-ease with a vowel-group
syllable approximation.

A standard pretraining-corpus quality feature alongside the Gopher /
C4 rules (functions/webfilter.py) and the entropy/TTR signals
(functions/infotheory.py): very low reading-ease flags run-on
machine-generated text and keyword soup; implausibly high flags
fragment lists.  The reference's quality-report surface
(evaluate_data.py stage-2 stats) motivates per-document numeric
signals; this one is corpus-standard rather than reference-specific.

Spark-first shape: one map-only projection — word split, per-word
vowel-group counts and the sentence split are all JVM higher-order
functions inside whole-stage codegen.  No shuffle, no Python, no
explode: a (doc, word) exchange at 10^12 turns would dwarf every
other stage, so the per-word fold stays inside the row.

Cross-engine value-hash discipline: the Flesch formula is a single
expression tree evaluated over exact integer counts, written
identically here and in the DuckDB twin, so both engines perform the
same IEEE operations in the same order — bit-identical doubles,
stable round(x, 6).  The band label is derived from the ROUNDED
score in both engines so no boundary can flip on sub-ULP noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["readability_stats", "readability_oracle_sql"]

_WORD_SPLIT = "[^a-z]+"
_SENT_SPLIT = "[.!?]+"
_VOWEL_RUN = "[aeiouy]+"


def _syllables(word: Column) -> Column:
    # Vowel-group heuristic: every maximal run of aeiouy is one
    # syllable, minimum one per word ("rhythm" -> 1, not 0).
    return F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(word, F.lit(_VOWEL_RUN), F.lit(0))),
    ).cast("long")


def readability_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document word / sentence / syllable counts, Flesch
    reading-ease (206.835 - 1.015*words/sentences -
    84.6*syllables/words) and a coarse band label."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), _WORD_SPLIT),
        lambda w: w != F.lit(""),
    )
    n_words = F.size(words)
    n_syll = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + _syllables(w),
    )
    n_sent = F.size(
        F.filter(
            F.split(F.col(text_col), _SENT_SPLIT),
            lambda s: F.trim(s) != F.lit(""),
        )
    )
    s_eff = F.greatest(F.lit(1), n_sent)
    flesch_raw = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words * F.lit(1.0) / s_eff)
        - F.lit(84.6) * (n_syll * F.lit(1.0) / n_words)
    )
    flesch = F.round(
        F.when(n_words > 0, flesch_raw).otherwise(F.lit(0.0)), 6
    )
    band = (
        F.when(n_words == 0, F.lit("empty"))
        .when(flesch >= 60.0, F.lit("easy"))
        .when(flesch >= 30.0, F.lit("standard"))
        .otherwise(F.lit("difficult"))
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        F.when(n_words > 0, n_syll).otherwise(F.lit(0)).alias("n_syllables"),
        flesch.alias("flesch"),
        band.alias("band"),
    )


def readability_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin: identical splits, identical vowel-group counts,
    identical formula tree, band from the same rounded score."""
    words = (
        f"list_filter(string_split_regex(lower({text_col}),"
        f" '{_WORD_SPLIT}'), w -> w <> '')"
    )
    n_words = f"len({words})"
    n_syll = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({words}, w -> CAST(greatest(1, "
        f"len(regexp_extract_all(w, '{_VOWEL_RUN}'))) AS BIGINT))), "
        "(a, b) -> a + b)"
    )
    n_sent = (
        f"len(list_filter(string_split_regex({text_col},"
        f" '{_SENT_SPLIT}'), s -> trim(s) <> ''))"
    )
    flesch = (
        f"round(CASE WHEN {n_words} > 0 THEN 206.835"
        f" - 1.015 * ({n_words} * 1.0 / greatest(1, {n_sent}))"
        f" - 84.6 * ({n_syll} * 1.0 / {n_words})"
        " ELSE 0.0 END, 6)"
    )
    return f"""
    SELECT {id_col},
           {n_words} AS n_words,
           {n_sent} AS n_sentences,
           CASE WHEN {n_words} > 0 THEN {n_syll} ELSE 0 END AS n_syllables,
           {flesch} AS flesch,
           CASE WHEN {n_words} = 0 THEN 'empty'
                WHEN {flesch} >= 60.0 THEN 'easy'
                WHEN {flesch} >= 30.0 THEN 'standard'
                ELSE 'difficult' END AS band
    FROM {table}
    """
