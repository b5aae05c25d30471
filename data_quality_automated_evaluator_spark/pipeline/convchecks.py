"""Conversation-level integrity checks for agent transcripts.

Three operators the north-star pipeline needs ABOVE the per-turn rules
(BASELINE north_star: "heuristic quality rules ... per turn and per
conversation"):

- :func:`conversation_drop_propagation` — a conversation whose per-turn
  keep fraction falls below a threshold is dropped WHOLE. Training on
  the surviving fragments of a mostly-junk conversation teaches broken
  dialogue structure; web-scale filters therefore propagate turn
  verdicts up to the conversation.
- :func:`agent_loop_stats` — agents that wedge repeat themselves: the
  same assistant text re-emitted turn after turn. Detected per
  conversation as (a) consecutive identical assistant turns and (b) the
  distinct-text deficit across all assistant turns.
- :func:`tool_pairing_stats` — protocol validity for tool use: a
  ``tool`` turn must follow an ``assistant`` turn (or another ``tool``
  turn in a multi-call batch), and the ``tool`` column must be set
  exactly on tool turns.

Scale shape: each operator is one shuffle on ``conv_id`` (window +
groupBy share the same Exchange) over narrow projections — text is
replaced by comparisons/hashes before any aggregation, so the shuffle
never carries transcript bodies beyond the per-conversation sort that
any per-conversation operator needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "conversation_drop_propagation",
    "agent_loop_stats",
    "tool_pairing_stats",
]


def conversation_drop_propagation(
    labels: DataFrame, min_keep_frac: float = 0.6
) -> DataFrame:
    """Per-conversation verdict from per-turn ``keep`` flags.

    ``labels`` is the pipeline's labels frame (``conv_id``,
    ``turn_idx``, ``keep``, ...). Returns one row per conversation with
    ``n_turns``, ``n_keep``, ``keep_frac`` and the propagated
    ``conv_keep`` (keep_frac ≥ ``min_keep_frac``). One hash aggregation
    on conv_id; at 10^12 turns this is the same uniform-key shuffle as
    any per-conversation stat, with partial aggregation map-side.
    """
    return (
        labels.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.round(F.avg(F.col("keep").cast("double")), 6).alias(
                "keep_frac"
            ),
        )
        .withColumn("conv_keep", F.col("keep_frac") >= min_keep_frac)
    )


def agent_loop_stats(
    df: DataFrame, max_loop_frac: float = 0.5, max_consec: int = 2
) -> DataFrame:
    """Detect wedged-agent loops per conversation.

    Over assistant turns ordered by ``turn_idx``:

    - ``n_consec_repeat``: turns whose text equals the PREVIOUS
      assistant text (classic stuck loop);
    - ``loop_frac``: 1 − distinct(assistant texts)/n_assistant — the
      repeated-content mass even when repeats are non-adjacent;
    - ``loop_ok``: loop_frac ≤ ``max_loop_frac`` AND n_consec_repeat ≤
      ``max_consec``.

    Texts are compared via xxhash64 so the window/aggregation shuffle
    carries 8-byte digests, not transcript bodies.
    """
    a = df.filter(F.col("role") == "assistant").select(
        "conv_id", "turn_idx", F.xxhash64("text").alias("h")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    a = a.withColumn(
        "consec", (F.col("h") == F.lag("h").over(w)).cast("long")
    )
    return (
        a.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_assistant"),
            F.count_distinct("h").alias("n_distinct"),
            F.coalesce(F.sum("consec"), F.lit(0)).alias("n_consec_repeat"),
        )
        .withColumn(
            "loop_frac",
            F.round(1 - F.col("n_distinct") / F.col("n_assistant"), 6),
        )
        .withColumn(
            "loop_ok",
            (F.col("loop_frac") <= max_loop_frac)
            & (F.col("n_consec_repeat") <= max_consec),
        )
    )


def tool_pairing_stats(df: DataFrame) -> DataFrame:
    """Tool-call protocol validity per conversation.

    - ``n_tool``: tool turns;
    - ``n_orphan_tool``: tool turns NOT preceded (by ``turn_idx``) by an
      assistant or tool turn — a tool result with no call site;
    - ``n_tool_mismatch``: turns where ``role == 'tool'`` disagrees with
      ``tool IS NOT NULL`` (either direction);
    - ``tool_ok``: no orphans and no mismatches.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = df.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("tool").isNotNull().alias("has_tool"),
    ).withColumn("prev_role", F.lag("role").over(w))
    orphan = (F.col("role") == "tool") & (
        F.col("prev_role").isNull()
        | ~F.col("prev_role").isin("assistant", "tool")
    )
    mismatch = (F.col("role") == "tool") != F.col("has_tool")
    return (
        t.groupBy("conv_id")
        .agg(
            F.sum((F.col("role") == "tool").cast("long")).alias("n_tool"),
            F.sum(orphan.cast("long")).alias("n_orphan_tool"),
            F.sum(mismatch.cast("long")).alias("n_tool_mismatch"),
        )
        .withColumn(
            "tool_ok",
            (F.col("n_orphan_tool") == 0) & (F.col("n_tool_mismatch") == 0),
        )
    )


def response_latency_stats(
    df: DataFrame, slow_threshold_sec: int = 60
) -> DataFrame:
    """Per-day agent response-latency audit: the gap between each user
    turn and the assistant turn that answers it.

    An operational-health signal over agent transcripts — rising
    response latency (or a spike in the slow-response share) flags a
    degrading serving stack long before quality rules do.  One window
    per ``conv_id`` ordered by ``turn_idx`` (lag of role and timestamp)
    feeds a tiny per-day aggregate, sharing the conversation Exchange;
    the shuffle carries (conv_id, turn_idx, role, ts) — never text.

    Gap seconds are exact: both timestamps truncate to whole seconds
    first, so Spark's interval-duration cast and DuckDB's
    boundary-counting ``date_diff`` agree (same trick as
    operators/profile.freshness_audit).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = df.select("conv_id", "turn_idx", "role", "ts")
    gaps = (
        turns.withColumn("prev_role", F.lag("role").over(w))
        .withColumn("prev_ts", F.lag("ts").over(w))
        .where((F.col("prev_role") == "user") & (F.col("role") == "assistant"))
        .withColumn(
            "gap_sec",
            (
                F.date_trunc("second", F.col("ts"))
                - F.date_trunc("second", F.col("prev_ts"))
            )
            .cast("interval day to second")
            .cast("long"),
        )
    )
    return (
        gaps.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_responses"),
            F.round(F.sum("gap_sec") / F.count(F.lit(1)), 6).alias(
                "mean_gap_sec"
            ),
            F.max("gap_sec").alias("max_gap_sec"),
            F.round(
                F.sum(
                    (F.col("gap_sec") > F.lit(int(slow_threshold_sec))).cast(
                        "int"
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("slow_share"),
        )
        .orderBy("day")
    )


def response_latency_oracle_sql(
    path: str, slow_threshold_sec: int = 60
) -> str:
    """DuckDB twin of :func:`response_latency_stats`."""
    return f"""
    WITH turns AS (
      SELECT conv_id, turn_idx, role, ts FROM read_parquet('{path}')
    ),
    lagged AS (
      SELECT conv_id, role, ts,
             lag(role) OVER w AS prev_role,
             lag(ts) OVER w AS prev_ts
      FROM turns
      WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
    ),
    gaps AS (
      SELECT ts,
             date_diff('second', date_trunc('second', prev_ts),
                       date_trunc('second', ts)) AS gap_sec
      FROM lagged
      WHERE prev_role = 'user' AND role = 'assistant'
    )
    SELECT date_trunc('day', ts) AS day,
           count(*) AS n_responses,
           round(sum(gap_sec) / count(*), 6) AS mean_gap_sec,
           CAST(max(gap_sec) AS BIGINT) AS max_gap_sec,
           round(sum(CASE WHEN gap_sec > {int(slow_threshold_sec)}
                          THEN 1 ELSE 0 END) / count(*), 6) AS slow_share
    FROM gaps GROUP BY 1 ORDER BY 1
    """
