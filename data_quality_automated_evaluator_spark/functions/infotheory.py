"""Information-theoretic text-quality signals: character entropy and
type-token ratio.

Low character-level Shannon entropy flags degenerate web text —
repeated characters, padding, ASCII-art, encoder junk — that
length/symbol-ratio heuristics (functions/webfilter.py) miss; very low
type-token ratio flags keyword-stuffing.  Both are standard
pretraining-corpus quality features (used alongside the Gopher rules).

Spark-first shape: everything is per-row JVM higher-order-function
arithmetic inside whole-stage codegen — no shuffle, no Python, no
per-char explode (a (doc, char) exchange at 10^12 turns would dwarf
every other stage).  The entropy is a single run-length fold over the
sorted char array: O(len·log len) per row, alphabet-independent.

Cross-engine value-hash discipline: ascending-run order equals
sorted-distinct order, so Spark's fold and the DuckDB oracle's
per-distinct sum accumulate the same IEEE doubles in the same order —
bit-identical sums, stable round(x, 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["char_entropy_stats", "entropy_oracle_sql"]


def char_entropy_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document: n_chars, n_distinct_chars, char entropy (bits),
    word type-token ratio, and a low-entropy flag (< 3 bits — natural
    prose sits near 4-4.5)."""
    chars = F.split(F.col(text_col), "")
    n = F.size(chars)
    uniq = F.array_sort(F.array_distinct(chars))
    # -sum over distinct chars of p*log2(p), computed as ONE run-length
    # fold over the sorted char array (the gopher_repetition pattern):
    # O(len·log len) sort + O(len) fold instead of the O(distinct·len)
    # filter-per-distinct-char scan (which benched 31 s over sf0.1
    # documents — 6× this shape).  Ascending-run order == sorted
    # distinct order, so the oracle's per-distinct sum adds the exact
    # same IEEE doubles in the exact same sequence.
    srt = F.array_sort(chars)

    # n rides in the fold's SEED struct, not the lambda body: a row
    # expression referenced inside the lambda is re-evaluated at every
    # step, so `run / F.size(F.split(text, ''))` re-splits the text per
    # character — O(len^2) per row (benched 21 s over sf0.1 documents
    # vs 4 s with the seed-carried n; results bit-identical).
    def _term(run, nn):
        p = run * 1.0 / nn
        return p * F.log2(p)

    def _step(acc, c):
        prev, run, s, nn = acc["p"], acc["r"], acc["s"], acc["n"]
        return F.when(
            c == prev,
            F.struct(
                prev.alias("p"), (run + 1).alias("r"), s.alias("s"), nn.alias("n")
            ),
        ).otherwise(
            F.struct(
                c.alias("p"),
                F.lit(1).cast("long").alias("r"),
                F.when(run > 0, s + _term(run, nn)).otherwise(s).alias("s"),
                nn.alias("n"),
            )
        )

    ent = -F.aggregate(
        srt,
        F.struct(
            F.lit("\x00").alias("p"),
            F.lit(0).cast("long").alias("r"),
            F.lit(0.0).alias("s"),
            n.cast("long").alias("n"),
        ),
        _step,
        lambda acc: F.when(
            acc["r"] > 0, acc["s"] + _term(acc["r"], acc["n"])
        ).otherwise(acc["s"]),
    )
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda w: w != F.lit(""),
    )
    ttr = F.when(
        F.size(words) > 0,
        F.size(F.array_distinct(words)) * 1.0 / F.size(words),
    ).otherwise(F.lit(0.0))
    entropy = F.when(n > 0, ent).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n.alias("n_chars"),
        F.size(uniq).alias("n_distinct_chars"),
        F.round(entropy, 6).alias("entropy_bits"),
        F.round(ttr, 6).alias("type_token_ratio"),
        (entropy < 3.0).alias("low_entropy"),
    )


def entropy_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin: identical fold over the identically-sorted distinct
    chars, identical word split, identical rounding."""
    chars = f"string_split({text_col}, '')"
    uniq = f"list_sort(list_distinct({chars}))"
    p = f"(len(list_filter({chars}, x -> x = c)) * 1.0 / len({chars}))"
    ent = (
        f"-list_reduce(list_prepend(0.0, list_transform({uniq}, "
        f"c -> {p} * log2({p}))), (acc, v) -> acc + v)"
    )
    words = (
        f"list_filter(string_split_regex(lower({text_col}), '[^a-z0-9]+'),"
        " w -> w <> '')"
    )
    return f"""
    SELECT {id_col},
           len({chars}) AS n_chars,
           len({uniq}) AS n_distinct_chars,
           round(CASE WHEN len({chars}) > 0 THEN {ent} ELSE 0.0 END, 6)
             AS entropy_bits,
           round(CASE WHEN len({words}) > 0
                 THEN len(list_distinct({words})) * 1.0 / len({words})
                 ELSE 0.0 END, 6) AS type_token_ratio,
           coalesce(CASE WHEN len({chars}) > 0 THEN {ent} ELSE 0.0 END
                    < 3.0, FALSE) AS low_entropy
    FROM {table}
    """
