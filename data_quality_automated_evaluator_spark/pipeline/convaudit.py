"""Conversation-health audits over agent transcripts.

Four operational audits a web-scale transcript pipeline runs ABOVE the
per-turn quality rules (BASELINE north_star: heuristic rules "per turn
and per conversation"; reference parity: the evaluator's interval-stat
reports, `evaluate_data.py`, generalized to dialogue structure):

- :func:`role_transition_stats` — the per-day role-bigram matrix
  (user→assistant, assistant→tool, ...). A drifting transition mix is
  the earliest structural signal that a serving stack or a scraper
  changed shape (e.g. tool-call share doubling overnight).
- :func:`conversation_outcome_stats` — how conversations END per day:
  abandoned on a user turn, dangling on a tool call, or closed by the
  assistant. Training on abandoned tails teaches the model to stop
  answering.
- :func:`templated_response_stats` — canned/templated assistant
  responses: normalize (lowercase, digit-collapse, whitespace-collapse),
  fingerprint a fixed-length prefix with md5, and count re-use across
  conversations. High-fan-out templates are boilerplate to drop or
  down-weight before training.
- :func:`tool_chain_stats` — consecutive-tool-call chain lengths via
  the gaps-and-islands trick (turn_idx − row_number), aggregated per
  day. Runaway chains flag wedged agents that per-turn rules miss.

Scale shape: every operator shuffles at most (conv_id, turn_idx, role,
ts) or a 32-byte md5 fingerprint — transcript text NEVER crosses an
Exchange (the template key is hashed map-side before the groupBy).
Distinct-conversation counts use the two-phase (key, conv_id) →
(key) aggregation instead of count(DISTINCT) so no Expand doubles the
shuffle. tool-chain islands are computed on the ~5% tool-turn slice
after a map-side role filter, so the window Exchange carries only tool
turns. All day-level outputs are bounded by |days| × small cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "role_transition_stats",
    "conversation_outcome_stats",
    "templated_response_stats",
    "tool_chain_stats",
    "role_transition_oracle_sql",
    "conversation_outcome_oracle_sql",
    "templated_response_oracle_sql",
    "tool_chain_oracle_sql",
]

_START = "<start>"


def role_transition_stats(df: DataFrame) -> DataFrame:
    """Per-day counts and day-shares of role bigrams.

    One conv_id window (lag of role) over a text-free projection, then a
    tiny (day, prev_role, role) hash aggregate with map-side partials;
    the day-share window runs on the aggregate frame (|days| × ≤25
    bigrams), partitioned by day — never a single-partition window.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bi = (
        df.select("conv_id", "turn_idx", "role", "ts")
        .withColumn(
            "prev_role", F.coalesce(F.lag("role").over(w), F.lit(_START))
        )
    )
    agg = bi.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "prev_role", "role"
    ).agg(F.count(F.lit(1)).alias("n"))
    day_w = Window.partitionBy("day")
    return (
        agg.withColumn(
            "day_share", F.round(F.col("n") / F.sum("n").over(day_w), 6)
        )
        .orderBy("day", "prev_role", "role")
    )


def role_transition_oracle_sql(path: str) -> str:
    """DuckDB twin of :func:`role_transition_stats`."""
    return f"""
    WITH t AS (
      SELECT conv_id, turn_idx, role, ts FROM read_parquet('{path}')
    ),
    b AS (
      SELECT ts, role,
             coalesce(lag(role) OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx),
                      '{_START}') AS prev_role
      FROM t
    ),
    a AS (
      SELECT date_trunc('day', ts) AS day, prev_role, role,
             count(*) AS n
      FROM b GROUP BY 1, 2, 3
    )
    SELECT day, prev_role, role, CAST(n AS BIGINT) AS n,
           round(n / sum(n) OVER (PARTITION BY day), 6) AS day_share
    FROM a ORDER BY day, prev_role, role
    """


def conversation_outcome_stats(df: DataFrame) -> DataFrame:
    """Per-day conversation-ending audit.

    One conv_id hash aggregate (max_by picks the closing role — turn_idx
    is unique per conversation, so the pick is deterministic), then a
    per-day aggregate over the one-row-per-conversation frame. Shuffles
    carry (conv_id, role, ts) — no text.
    """
    per_conv = df.groupBy("conv_id").agg(
        F.max_by("role", "turn_idx").alias("last_role"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    return (
        per_conv.groupBy(
            F.date_trunc("day", F.col("last_ts")).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum((F.col("last_role") == "user").cast("long")).alias(
                "n_abandoned"
            ),
            F.sum((F.col("last_role") == "tool").cast("long")).alias(
                "n_tool_tail"
            ),
            F.round(
                F.avg((F.col("last_role") == "assistant").cast("double")), 6
            ).alias("assistant_close_share"),
            F.round(F.avg("n_turns"), 6).alias("mean_turns"),
        )
        .orderBy("day")
    )


def conversation_outcome_oracle_sql(path: str) -> str:
    """DuckDB twin of :func:`conversation_outcome_stats`."""
    return f"""
    WITH per_conv AS (
      SELECT conv_id,
             arg_max(role, turn_idx) AS last_role,
             max(ts) AS last_ts,
             count(*) AS n_turns
      FROM read_parquet('{path}') GROUP BY conv_id
    )
    SELECT date_trunc('day', last_ts) AS day,
           count(*) AS n_convs,
           CAST(sum(CASE WHEN last_role = 'user' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_abandoned,
           CAST(sum(CASE WHEN last_role = 'tool' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tool_tail,
           round(avg(CASE WHEN last_role = 'assistant'
                          THEN 1.0 ELSE 0.0 END), 6)
             AS assistant_close_share,
           round(avg(n_turns), 6) AS mean_turns
    FROM per_conv GROUP BY 1 ORDER BY 1
    """


# whitespace class shared by both engines: explicit chars, not \\s, so the
# Java-regex (\\s includes \\x0B) vs RE2 (\\s excludes it) seam is closed
_WS = "[ \t\r\n]+"


def _template_key(prefix_len: int):
    """Map-side template fingerprint: normalize then md5 a fixed prefix.

    lowercase → collapse digit runs to '0' → collapse whitespace runs to
    one space → trim → md5(first ``prefix_len`` chars). The 32-hex-char
    key is what shuffles; the text never does.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "0"),
            _WS,
            " ",
        )
    )
    return F.md5(F.substring(norm, 1, prefix_len))


def templated_response_stats(
    df: DataFrame, prefix_len: int = 48, min_convs: int = 3
) -> DataFrame:
    """Templated-assistant-response detector.

    Emits one row per normalized-prefix fingerprint re-used in at least
    ``min_convs`` distinct conversations: total uses and distinct
    conversations. Distinct counting is the two-phase
    (hash, conv_id) → (hash) aggregation — no count(DISTINCT) Expand;
    both shuffles carry only (md5, conv_id) pairs.
    """
    keyed = (
        df.where(F.col("role") == "assistant")
        .select(
            "conv_id",
            _template_key(prefix_len).alias("template_hash"),
        )
    )
    per = keyed.groupBy("template_hash", "conv_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        per.groupBy("template_hash")
        .agg(
            F.sum("n").alias("n_uses"),
            F.count(F.lit(1)).alias("n_convs"),
        )
        .where(F.col("n_convs") >= int(min_convs))
        .orderBy(F.desc("n_uses"), "template_hash")
    )


def templated_response_oracle_sql(
    path: str, prefix_len: int = 48, min_convs: int = 3
) -> str:
    """DuckDB twin of :func:`templated_response_stats`."""
    # real TAB/CR/LF characters are embedded by Python before DuckDB
    # parses the literal, matching the Spark-side class exactly
    ws = "[ \t\r\n]+"
    return f"""
    WITH keyed AS (
      SELECT conv_id,
             md5(substr(trim(regexp_replace(
                   regexp_replace(lower(text), '[0-9]+', '0', 'g'),
                   '{ws}', ' ', 'g')), 1, {int(prefix_len)}))
               AS template_hash
      FROM read_parquet('{path}') WHERE role = 'assistant'
    ),
    per AS (
      SELECT template_hash, conv_id, count(*) AS n
      FROM keyed GROUP BY 1, 2
    )
    SELECT template_hash,
           CAST(sum(n) AS BIGINT) AS n_uses,
           count(*) AS n_convs
    FROM per GROUP BY 1 HAVING count(*) >= {int(min_convs)}
    ORDER BY n_uses DESC, template_hash
    """


def tool_chain_stats(df: DataFrame) -> DataFrame:
    """Per-day consecutive-tool-call chain audit.

    Gaps-and-islands: on the tool-turn slice (map-side role filter, so
    the window Exchange carries ~5% of turns), ``turn_idx − row_number``
    is constant within each unbroken run. Chains aggregate per
    (conv_id, island), then per day of the chain's first call.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    chains = (
        df.where(F.col("role") == "tool")
        .select("conv_id", "turn_idx", "ts")
        .withColumn("island", F.col("turn_idx") - F.row_number().over(w))
        .groupBy("conv_id", "island")
        .agg(
            F.count(F.lit(1)).alias("chain_len"),
            F.min("ts").alias("start_ts"),
        )
    )
    return (
        chains.groupBy(F.date_trunc("day", F.col("start_ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_chains"),
            F.max("chain_len").alias("max_chain_len"),
            F.round(F.avg("chain_len"), 6).alias("mean_chain_len"),
            F.round(
                F.avg((F.col("chain_len") >= 3).cast("double")), 6
            ).alias("share_ge3"),
        )
        .orderBy("day")
    )


def tool_chain_oracle_sql(path: str) -> str:
    """DuckDB twin of :func:`tool_chain_stats`."""
    return f"""
    WITH tools AS (
      SELECT conv_id, turn_idx, ts
      FROM read_parquet('{path}') WHERE role = 'tool'
    ),
    isl AS (
      SELECT conv_id, ts,
             turn_idx - row_number() OVER (PARTITION BY conv_id
                                           ORDER BY turn_idx) AS island
      FROM tools
    ),
    chains AS (
      SELECT conv_id, island, count(*) AS chain_len,
             min(ts) AS start_ts
      FROM isl GROUP BY 1, 2
    )
    SELECT date_trunc('day', start_ts) AS day,
           count(*) AS n_chains,
           CAST(max(chain_len) AS BIGINT) AS max_chain_len,
           round(avg(chain_len), 6) AS mean_chain_len,
           round(avg(CASE WHEN chain_len >= 3 THEN 1.0 ELSE 0.0 END), 6)
             AS share_ge3
    FROM chains GROUP BY 1 ORDER BY 1
    """


def context_overflow_stats(
    df: DataFrame, token_budget: int = 512
) -> DataFrame:
    """Per-day context-window overflow audit.

    Estimates tokens per turn with the shared BPE-ish JVM regex
    (functions/textstats.bpe_token_count — oracle-parity-proven), runs a
    cumulative sum over each conversation, and reports per day of the
    conversation's first turn: how many conversations exceed
    ``token_budget`` total tokens, at which turn the budget first
    overflows, and the mean conversation token mass. Feeding an SFT
    packer conversations that overflow its context silently truncates
    tails — this is the per-day tripwire for that.

    Scale shape: token counts are computed in scan codegen (map-side),
    so the conv_id window Exchange carries (conv_id, turn_idx, n_tok,
    ts) — never text; the day aggregate is conversation-sized.
    """
    from ..functions.textstats import bpe_token_count

    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    turns = df.select(
        "conv_id",
        "turn_idx",
        "ts",
        bpe_token_count(F.coalesce(F.col("text"), F.lit(""))).alias(
            "n_tok"
        ),
    ).withColumn("cum_tok", F.sum("n_tok").over(w))
    per_conv = turns.groupBy("conv_id").agg(
        F.min("ts").alias("start_ts"),
        F.max("cum_tok").alias("total_tok"),
        F.min(
            F.when(
                F.col("cum_tok") > int(token_budget), F.col("turn_idx")
            )
        ).alias("overflow_turn"),
    )
    return (
        per_conv.groupBy(
            F.date_trunc("day", F.col("start_ts")).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum(
                F.col("overflow_turn").isNotNull().cast("long")
            ).alias("n_overflow"),
            F.round(
                F.avg(F.col("overflow_turn").isNotNull().cast("double")),
                6,
            ).alias("overflow_share"),
            F.round(F.avg("total_tok"), 6).alias("mean_total_tok"),
            F.round(F.avg("overflow_turn"), 6).alias(
                "mean_overflow_turn"
            ),
        )
        .orderBy("day")
    )


def context_overflow_oracle_sql(path: str, token_budget: int = 512) -> str:
    """DuckDB twin of :func:`context_overflow_stats` (RE2 spelling of the
    shared BPE token regex, identical cumulative-window semantics)."""
    from ..functions.textstats import BPE_TOKEN_RE

    pat = BPE_TOKEN_RE.replace("'", "''")
    return f"""
    WITH turns AS (
      SELECT conv_id, turn_idx, ts,
             len(regexp_extract_all(coalesce(text, ''), '{pat}'))
               AS n_tok
      FROM read_parquet('{path}')
    ),
    cum AS (
      SELECT conv_id, turn_idx, ts,
             sum(n_tok) OVER (PARTITION BY conv_id ORDER BY turn_idx
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_tok
      FROM turns
    ),
    per_conv AS (
      SELECT conv_id, min(ts) AS start_ts,
             max(cum_tok) AS total_tok,
             min(CASE WHEN cum_tok > {int(token_budget)}
                      THEN turn_idx END) AS overflow_turn
      FROM cum GROUP BY conv_id
    )
    SELECT date_trunc('day', start_ts) AS day,
           count(*) AS n_convs,
           CAST(sum(CASE WHEN overflow_turn IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow,
           round(avg(CASE WHEN overflow_turn IS NOT NULL
                          THEN 1.0 ELSE 0.0 END), 6) AS overflow_share,
           round(avg(total_tok), 6) AS mean_total_tok,
           round(avg(overflow_turn), 6) AS mean_overflow_turn
    FROM per_conv GROUP BY 1 ORDER BY 1
    """


def turn_integrity_stats(df: DataFrame) -> DataFrame:
    """Per-day turn-ordering integrity audit.

    The north rule's per-turn parity contract assumes "stable turn
    ordering" — this is the audit that proves the assumption on real
    data: per conversation it detects (a) turn_idx gaps (max+1 ≠ count),
    (b) duplicate turn_idx values, and (c) timestamp inversions against
    turn order (ts < previous ts). Broken conversations cannot be
    reassembled deterministically and must be quarantined before the
    pipeline runs.

    One conv_id window (lag of second-truncated ts — the exact-seconds
    parity trick) and one conv_id aggregate share the Exchange; the
    shuffle carries (conv_id, turn_idx, ts) only. The day rollup is
    conversation-sized.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = (
        df.select("conv_id", "turn_idx", "ts")
        .withColumn(
            "inv",
            (
                F.date_trunc("second", F.col("ts"))
                < F.date_trunc("second", F.lag("ts").over(w))
            ).cast("long"),
        )
        # the window sorts by turn_idx, so duplicate indices are ADJACENT:
        # a lag equality detects them without a count(DISTINCT) Expand
        .withColumn(
            "dup",
            (F.col("turn_idx") == F.lag("turn_idx").over(w)).cast("long"),
        )
    )
    per_conv = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.coalesce(F.col("dup"), F.lit(0))).alias("n_dup_rows"),
        F.max("turn_idx").alias("max_idx"),
        F.min("ts").alias("start_ts"),
        F.sum(F.coalesce(F.col("inv"), F.lit(0))).alias("n_inversions"),
    )
    flagged = per_conv.select(
        F.date_trunc("day", F.col("start_ts")).alias("day"),
        (
            F.col("max_idx") + 1 != F.col("n_turns") - F.col("n_dup_rows")
        ).cast("long").alias("has_gap"),
        (F.col("n_dup_rows") > 0).cast("long").alias("has_dup_idx"),
        (F.col("n_inversions") > 0).cast("long").alias("has_inversion"),
        "n_inversions",
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("has_gap").alias("n_gap_convs"),
            F.sum("has_dup_idx").alias("n_dup_idx_convs"),
            F.sum("has_inversion").alias("n_inversion_convs"),
            F.sum("n_inversions").alias("n_inversions"),
        )
        .orderBy("day")
    )


def turn_integrity_oracle_sql(path: str) -> str:
    """DuckDB twin of :func:`turn_integrity_stats`."""
    return f"""
    WITH turns AS (
      SELECT conv_id, turn_idx, ts,
             CASE WHEN date_trunc('second', ts) <
                       date_trunc('second',
                                  lag(ts) OVER w)
                  THEN 1 ELSE 0 END AS inv,
             CASE WHEN turn_idx = lag(turn_idx) OVER w
                  THEN 1 ELSE 0 END AS dup
      FROM read_parquet('{path}')
      WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
    ),
    per_conv AS (
      SELECT conv_id, count(*) AS n_turns,
             sum(coalesce(dup, 0)) AS n_dup_rows,
             max(turn_idx) AS max_idx,
             min(ts) AS start_ts,
             sum(coalesce(inv, 0)) AS n_inversions
      FROM turns GROUP BY conv_id
    )
    SELECT date_trunc('day', start_ts) AS day,
           count(*) AS n_convs,
           CAST(sum(CASE WHEN max_idx + 1 <> n_turns - n_dup_rows
                         THEN 1 ELSE 0 END)
                AS BIGINT) AS n_gap_convs,
           CAST(sum(CASE WHEN n_dup_rows > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_idx_convs,
           CAST(sum(CASE WHEN n_inversions > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inversion_convs,
           CAST(sum(n_inversions) AS BIGINT) AS n_inversions
    FROM per_conv GROUP BY 1 ORDER BY 1
    """
