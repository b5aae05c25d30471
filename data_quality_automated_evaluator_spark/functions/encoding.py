"""Encoding-health audit: mojibake / replacement-char / C1-control scan.

Web-scraped and multiply-transcoded corpora carry three classic encoding
defects that silently degrade training data:

* ``U+FFFD`` replacement characters — a decoder already gave up once;
* cp1252-style mojibake digraphs (``Ã©`` for ``é``, ``â€`` for curly
  punctuation) — UTF-8 bytes re-decoded as a legacy code page;
* C1 control characters (U+0080–U+009F) — raw legacy-encoding bytes that
  survived into the text.

This module counts all three plus the non-ASCII fraction, per document,
with JVM-side ``regexp_count`` only (single-char classes and literal
alternations — no Python in the hot path), then aggregates per group.
Every pattern below was probe-verified to count identically under Java
regex (Spark) and RE2 (DuckDB), so the audit is driver value-checkable.

Patterns are spelled with ``\\u`` escapes in source so the repo itself
never contains raw C1 bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "encoding_audit",
    "encoding_audit_oracle_sql",
    "MOJI_SUFFIX",
    "REPL_SUFFIX",
]

#: U+FFFD literal (one char).
PAT_REPL = "�"

#: cp1252 mojibake digraphs: Ã + a Latin-1-supplement tail, or â€ (the
#: prefix of every curly-punctuation mojibake triple).
PAT_MOJI = (
    "Ã[©¨¤¶¼±§¯]"
    "|â€"
)

#: C1 control block.
PAT_C1 = r"[\x{80}-\x{9F}]"

#: Anything outside printable ASCII + common whitespace.
PAT_NON_ASCII = r"[^\x{20}-\x{7E}\t\n\r]"

#: Deterministic corpus-augmentation suffixes (the test tables are pure
#: ASCII, so the registered query plants defects on a doc_id lattice —
#: same constants interpolated into the DuckDB oracle, byte for byte).
MOJI_SUFFIX = (
    " naÃ¯ve â€” cafÃ©"
)
REPL_SUFFIX = " bad � byte"


def _signals(text: Column) -> dict[str, Column]:
    return {
        "repl": F.regexp_count(text, F.lit(PAT_REPL)),
        "moji": F.regexp_count(text, F.lit(PAT_MOJI)),
        "c1": F.regexp_count(text, F.lit(PAT_C1)),
        "non_ascii": F.regexp_count(text, F.lit(PAT_NON_ASCII)),
        "n_chars": F.length(text),
    }


def encoding_audit(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-group encoding-health rollup.

    Map-only signal extraction (whole-stage codegen regexp counts) into
    ONE map-side-combined ``groupBy`` — the same shape at 10^12 rows.
    ``ascii_ratio`` divides exact BIGINT sums; ``suspect_docs`` counts
    documents with any defect signal.
    """
    s = _signals(F.col(text_col))
    scored = df.select(
        F.col(group_col),
        s["repl"].alias("__repl"),
        s["moji"].alias("__moji"),
        s["c1"].alias("__c1"),
        s["non_ascii"].alias("__na"),
        s["n_chars"].alias("__len"),
    )
    return (
        scored.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__repl").cast("bigint").alias("repl_chars"),
            F.sum("__moji").cast("bigint").alias("moji_hits"),
            F.sum("__c1").cast("bigint").alias("c1_chars"),
            F.sum("__na").cast("bigint").alias("non_ascii_chars"),
            F.round(
                F.lit(1.0)
                - F.sum("__na") / F.greatest(F.sum("__len"), F.lit(1)),
                6,
            ).alias("ascii_ratio"),
            F.sum(
                (
                    (F.col("__repl") + F.col("__moji") + F.col("__c1")) > 0
                ).cast("int")
            )
            .cast("bigint")
            .alias("suspect_docs"),
        )
        .orderBy(group_col)
    )


def encoding_audit_oracle_sql(table_expr: str, text: str, group: str) -> str:
    """DuckDB twin of :func:`encoding_audit` — RE2 counts of the same
    patterns (DuckDB string literals are escape-free, so the ``\\x{..}``
    classes pass through verbatim)."""
    return f"""
    WITH scored AS (
      SELECT {group} AS g,
             len(regexp_extract_all({text}, '{PAT_REPL}')) AS repl,
             len(regexp_extract_all({text}, '{PAT_MOJI}')) AS moji,
             len(regexp_extract_all({text}, '[\\x{{80}}-\\x{{9F}}]')) AS c1,
             len(regexp_extract_all({text},
                 '[^\\x{{20}}-\\x{{7E}}\\t\\n\\r]')) AS na,
             length({text}) AS len
      FROM {table_expr}
    )
    SELECT g AS {group}, count(*) AS n_docs,
           CAST(sum(repl) AS BIGINT) AS repl_chars,
           CAST(sum(moji) AS BIGINT) AS moji_hits,
           CAST(sum(c1) AS BIGINT) AS c1_chars,
           CAST(sum(na) AS BIGINT) AS non_ascii_chars,
           round(1.0 - sum(na) / greatest(sum(len), 1), 6) AS ascii_ratio,
           CAST(sum(CASE WHEN repl + moji + c1 > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS suspect_docs
    FROM scored GROUP BY g ORDER BY g
    """
