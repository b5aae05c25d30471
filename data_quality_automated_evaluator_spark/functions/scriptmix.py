"""Unicode script-mix audit over a text corpus.

Per-document counts of characters in explicit BMP script ranges (Latin
letters, Han, Cyrillic, kana, decimal digits), a priority-order dominant
script, and a mixed-script flag — then one tiny per-language aggregate.
Mixed-script documents (e.g. Latin spam injected into a Han page, or
mojibake-driven Cyrillic runs inside English) are a classic web-filter
signal that pure language-ID misses because the winning language can
still be right.

Parity design: script classes are EXPLICIT code-point ranges embedded as
literal characters from the same Python constants into both the Spark
(Java regex) pattern and the DuckDB (RE2) pattern — no `\\p{...}` names,
whose spellings differ between engines. Counting is
``length(text) − length(regexp_replace(text, '[class]', ''))``; all
ranges are BMP-only so both engines count code points identically.

Scale shape: everything up to the final aggregate is a map-only Project
in scan codegen (JVM regexp_replace/length — no Python, no shuffle of
text); the groupBy ships #langs × 10 small numerics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# explicit BMP ranges, shared verbatim by both engines
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-z",
    "han": "一-鿿",
    "cyrillic": "Ѐ-ӿ",
    "kana": "぀-ヿ",
    "digit": "0-9",
}
# dominant-script tie-break: first max in this fixed order
SCRIPT_PRIORITY = ("latin", "han", "cyrillic", "kana")
# a script "counts" toward the mixed flag above this many chars
MIX_MIN_CHARS = 5


def _count(text: Column, ranges: str) -> Column:
    return F.length(text) - F.length(
        F.regexp_replace(text, f"[{ranges}]", "")
    )


def script_mix_stats(df: DataFrame, text_col: str = "text",
                     lang_col: str = "lang") -> DataFrame:
    """Per-language script-mix aggregate (see module docstring)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = {k: _count(text, r) for k, r in SCRIPT_RANGES.items()}
    n_chars = F.length(text)

    # dominant script: first in SCRIPT_PRIORITY attaining the max count,
    # 'none' when no script chars at all — the same when-chain shape is
    # generated for the oracle, so tie semantics match exactly
    best = F.greatest(*[counts[k] for k in SCRIPT_PRIORITY])
    dom = F.when(best <= 0, F.lit("none"))
    for k in SCRIPT_PRIORITY:
        dom = dom.when(counts[k] == best, F.lit(k))
    n_mixed_scripts = sum(
        (counts[k] >= MIX_MIN_CHARS).cast("int") for k in SCRIPT_PRIORITY
    )

    per_doc = df.select(
        F.col(lang_col).alias("lang"),
        n_chars.alias("n_chars"),
        *[counts[k].alias(f"n_{k}") for k in SCRIPT_RANGES],
        dom.alias("dominant_script"),
        (n_mixed_scripts >= 2).cast("int").alias("is_mixed"),
    )
    share = {
        k: F.round(
            F.avg(
                F.when(F.col("n_chars") > 0,
                       F.col(f"n_{k}") / F.col("n_chars")).otherwise(0.0)
            ),
            6,
        ).alias(f"{k}_share")
        for k in SCRIPT_RANGES
    }
    return (
        per_doc.groupBy("lang", "dominant_script")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[share[k] for k in SCRIPT_RANGES],
            F.round(F.avg("is_mixed"), 6).alias("mixed_share"),
        )
        .orderBy("lang", "dominant_script")
    )


def script_mix_oracle_sql(table_expr: str, text_col: str = "text",
                          lang_col: str = "lang") -> str:
    """DuckDB twin of :func:`script_mix_stats` (same literals, same
    when-chain tie-break, same share arithmetic)."""
    c = {
        k: (
            f"length(t) - length(regexp_replace(t, '[{r}]', '', 'g'))"
        )
        for k, r in SCRIPT_RANGES.items()
    }
    best = "greatest({})".format(
        ", ".join(f"n_{k}" for k in SCRIPT_PRIORITY)
    )
    dom_chain = "CASE WHEN {b} <= 0 THEN 'none' {whens} END".format(
        b=best,
        whens=" ".join(
            f"WHEN n_{k} = {best} THEN '{k}'" for k in SCRIPT_PRIORITY
        ),
    )
    mixed = " + ".join(
        f"(CASE WHEN n_{k} >= {MIX_MIN_CHARS} THEN 1 ELSE 0 END)"
        for k in SCRIPT_PRIORITY
    )
    shares = ", ".join(
        f"round(avg(CASE WHEN n_chars > 0 THEN n_{k} / n_chars "
        f"ELSE 0.0 END), 6) AS {k}_share"
        for k in SCRIPT_RANGES
    )
    return f"""
    WITH src AS (
      SELECT {lang_col} AS lang, coalesce({text_col}, '') AS t
      FROM {table_expr}
    ),
    counted AS (
      SELECT lang, length(t) AS n_chars,
             {", ".join(f"{c[k]} AS n_{k}" for k in SCRIPT_RANGES)}
      FROM src
    ),
    per_doc AS (
      SELECT lang, n_chars,
             {", ".join(f"n_{k}" for k in SCRIPT_RANGES)},
             {dom_chain} AS dominant_script,
             CASE WHEN ({mixed}) >= 2 THEN 1 ELSE 0 END AS is_mixed
      FROM counted
    )
    SELECT lang, dominant_script, count(*) AS n_docs,
           {shares},
           round(avg(is_mixed), 6) AS mixed_share
    FROM per_doc GROUP BY 1, 2 ORDER BY 1, 2
    """
