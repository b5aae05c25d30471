"""Corpus-health audits over transcripts: perplexity tiers, toxicity
rates, conversation role-consistency.

Three observability counterparts to the quality-filter pipeline
(reference behavior: the reference aggregates per-interval rule stats
over a single table — reference evaluate.py / preprocess.py:69; these
extend that surface to the transcript-specific signals the keep/drop
rules consume):

- :func:`ppl_tier_stats` — CCNet-style head/middle/tail tiering by LM
  perplexity (Wenzek et al., LREC 2020): the curation knob that decides
  which slice of a crawl is worth training on. Fixed thresholds, not
  rank terciles, so the oracle compare is threshold-boolean-robust
  (same class as the keep-flags ``r_ppl`` term) instead of sensitive to
  1-ulp rank flips between the numpy and SQL scorers.
- :func:`toxicity_stats` — per-day/per-role toxic-turn share from the
  same lexicon the scrub pass masks (functions/scrub.TOXIC_LEXICON); a
  rate spike is an upstream-source incident before it is a scrub load.
- :func:`role_consistency_audit` — per-day conversation-structure
  violations (first role, adjacent repeats, tool orphans/mismatches):
  the conversation-level rules of pipeline/rules.py re-aggregated as an
  operational time series.

Scale shape: every audit is map-only feature extraction (JVM regex or
one Arrow-batched pandas UDF) feeding a tiny keyed aggregate; the only
wide exchange is the conv_id window in the role audit, and its shuffle
rows carry (conv_id, turn_idx, role, tool-flag, ts) — never text.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scrub import TOXIC_LEXICON
from .features import perplexity_udf

# Tier boundaries sit in the gaps of the corpus ppl distribution (p75 ≈
# 14.5, p90 ≈ 19 on the committed fixture) and away from any observed
# value by ≥1e-6 — the numpy↔SQL scorer drift is ≤3e-14 relative, so a
# threshold compare can never flip between the engines.
HEAD_MAX_PPL = 13.0
MIDDLE_MAX_PPL = 18.0

_TOX_RE = r"(?i)\b(?:" + "|".join(map(re.escape, TOXIC_LEXICON)) + r")\b"


def ppl_tier_stats(
    df: DataFrame,
    head_max: float = HEAD_MAX_PPL,
    middle_max: float = MIDDLE_MAX_PPL,
) -> DataFrame:
    """Per-day head/middle/tail perplexity tiers over transcript turns.

    Output: (day, tier, n_turns, sum_chars) — integer measures only, so
    the value hash is float-drift-proof; the doubles stay inside the
    tier CASE. One Arrow scoring pass on the scan side, text projected
    away before the day×tier aggregate (3 tiers × days rows).
    """
    scored = df.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
        perplexity_udf(F.col("text")).alias("ppl"),
    ).withColumn(
        "tier",
        F.when(F.col("ppl") <= F.lit(head_max), F.lit("head"))
        .when(F.col("ppl") <= F.lit(middle_max), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    return (
        scored.groupBy("day", "tier")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("day", "tier")
    )


def ppl_tier_oracle_sql(
    path: str,
    head_max: float = HEAD_MAX_PPL,
    middle_max: float = MIDDLE_MAX_PPL,
) -> str:
    """DuckDB twin of :func:`ppl_tier_stats` — reuses the exact ppl CTE
    chain of the keep-flags oracle (oracle_sql.ppl_chain_ctes)."""
    from .oracle_sql import ppl_chain_ctes

    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, text, ts FROM read_parquet('{path}')
),
{ppl_chain_ctes()},
tiered AS (
  SELECT date_trunc('day', t.ts) AS day,
         length(coalesce(t.text, '')) AS n_chars,
         CASE WHEN p.ppl <= {head_max} THEN 'head'
              WHEN p.ppl <= {middle_max} THEN 'middle'
              ELSE 'tail' END AS tier
  FROM t JOIN ppl p
    ON p.conv_id = t.conv_id AND p.turn_idx = t.turn_idx
)
SELECT day, tier, count(*) AS n_turns,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM tiered GROUP BY day, tier ORDER BY day, tier
"""


def toxicity_stats(df: DataFrame) -> DataFrame:
    """Per-day per-role toxic-turn rates from the scrub lexicon.

    Output: (day, role, n_turns, n_toxic, tox_share). Presence only →
    short-circuiting ``rlike`` in the scan (no full-match enumeration),
    one tiny day×role aggregate. ``tox_share`` is one IEEE division of
    two integers — bit-identical across engines.
    """
    flagged = df.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("role"),
        F.coalesce(F.col("text"), F.lit(""))
        .rlike(_TOX_RE)
        .cast("int")
        .alias("is_toxic"),
    )
    return (
        flagged.groupBy("day", "role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("is_toxic").alias("n_toxic"),
            F.round(F.sum("is_toxic") / F.count(F.lit(1)), 6).alias(
                "tox_share"
            ),
        )
        .orderBy("day", "role")
    )


def toxicity_oracle_sql(path: str) -> str:
    """DuckDB twin of :func:`toxicity_stats` (RE2 shares Java's ASCII
    ``\\b`` semantics for this all-ASCII lexicon)."""
    words = "|".join(map(re.escape, TOXIC_LEXICON))
    return f"""
WITH flagged AS (
  SELECT date_trunc('day', ts) AS day, role,
         CASE WHEN regexp_matches(coalesce(text, ''),
                                  '(?i)\\b(?:{words})\\b')
              THEN 1 ELSE 0 END AS is_toxic
  FROM read_parquet('{path}')
)
SELECT day, role, count(*) AS n_turns,
       CAST(sum(is_toxic) AS BIGINT) AS n_toxic,
       round(sum(is_toxic) / count(*), 6) AS tox_share
FROM flagged GROUP BY day, role ORDER BY day, role
"""


def role_consistency_audit(df: DataFrame) -> DataFrame:
    """Per-day conversation-structure violation counts.

    A conversation is dated by its first turn's day and contributes at
    most 1 to each violation counter (max-over-conv semantics — the
    same flags pipeline/rules.py folds into ``keep``, surfaced as a
    time series):

    - ``n_bad_first``       first turn's role != 'user'
    - ``n_adjacent_repeat`` any adjacent (user|assistant) pair with
                            equal roles
    - ``n_tool_orphan``     a 'tool' turn not preceded by assistant/tool
    - ``n_tool_mismatch``   any turn where (tool IS NOT NULL) !=
                            (role == 'tool')

    One conv_id window Exchange over (conv_id, turn_idx, role,
    has_tool, ts); per-conv flags collapse to a days-sized aggregate.
    """
    w_ord = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = df.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("tool").isNotNull().alias("has_tool"),
        "ts",
    ).withColumn("prev_role", F.lag("role").over(w_ord))
    per_conv = turns.groupBy("conv_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day"),
        F.max(
            (
                (F.col("turn_idx") == 0) & (F.col("role") != "user")
            ).cast("int")
        ).alias("bad_first"),
        F.max(
            (
                F.col("prev_role").isin("user", "assistant")
                & (F.col("role") == F.col("prev_role"))
            ).cast("int")
        ).alias("adjacent_repeat"),
        F.max(
            (
                (F.col("role") == "tool")
                & ~F.coalesce(
                    F.col("prev_role").isin("assistant", "tool"),
                    F.lit(False),
                )
            ).cast("int")
        ).alias("tool_orphan"),
        F.max(
            (F.col("has_tool") != (F.col("role") == "tool")).cast("int")
        ).alias("tool_mismatch"),
    )
    return (
        per_conv.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("bad_first").alias("n_bad_first"),
            F.sum("adjacent_repeat").alias("n_adjacent_repeat"),
            F.sum("tool_orphan").alias("n_tool_orphan"),
            F.sum("tool_mismatch").alias("n_tool_mismatch"),
        )
        .orderBy("day")
    )


def role_consistency_oracle_sql(path: str) -> str:
    """DuckDB twin of :func:`role_consistency_audit`."""
    return f"""
WITH turns AS (
  SELECT conv_id, turn_idx, role, (tool IS NOT NULL) AS has_tool, ts,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS prev_role
  FROM read_parquet('{path}')
),
per_conv AS (
  SELECT conv_id,
         date_trunc('day', min(ts)) AS day,
         max(CASE WHEN turn_idx = 0 AND role != 'user'
                  THEN 1 ELSE 0 END) AS bad_first,
         max(CASE WHEN prev_role IN ('user', 'assistant')
                       AND role = prev_role
                  THEN 1 ELSE 0 END) AS adjacent_repeat,
         max(CASE WHEN role = 'tool' AND NOT coalesce(
                    prev_role IN ('assistant', 'tool'), FALSE)
                  THEN 1 ELSE 0 END) AS tool_orphan,
         max(CASE WHEN has_tool != (role = 'tool')
                  THEN 1 ELSE 0 END) AS tool_mismatch
  FROM turns GROUP BY conv_id
)
SELECT day, count(*) AS n_convs,
       CAST(sum(bad_first) AS BIGINT) AS n_bad_first,
       CAST(sum(adjacent_repeat) AS BIGINT) AS n_adjacent_repeat,
       CAST(sum(tool_orphan) AS BIGINT) AS n_tool_orphan,
       CAST(sum(tool_mismatch) AS BIGINT) AS n_tool_mismatch
FROM per_conv GROUP BY day ORDER BY day
"""
