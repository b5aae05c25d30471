"""Structured Streaming variant of the quality filter.

The batch pipeline's per-turn stages (features → rules → scrub) are
stateless projections, so they lift to a stream unchanged. What changes
for an unbounded source:

- **conversation features** need bounded state: a watermark on ``ts``
  plus a session-style aggregation per ``conv_id``. Here we take the
  windowed-aggregation route: per (conv_id, tumbling window) role
  violations and turn counts with a watermark for late data — at
  10^12-turn scale a conversation is bounded in time, so a generous
  window + watermark covers reassembly without unbounded state.
- **per-interval rule stats** become a watermarked windowed groupBy —
  the streaming mirror of the reference's interval aggregation.

Sinks append to the same partitioned layout as the batch QualitySink
(checkpointLocation gives exactly-once file output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.features import langid_udf, perplexity_udf
from ..pipeline.quality import scrub_udf
from ..pipeline.rules import RULE_NAMES, Thresholds, rule_columns
from ..functions.textstats import with_text_features

# conversation-scope rules need cross-row state; the per-turn subset is
# computable on a stream without any state:
STATELESS_RULES = ["r_len", "r_symbol", "r_repetition", "r_lang", "r_ppl", "r_role"]


def streaming_turn_quality(stream_df: DataFrame, t: Thresholds = Thresholds()) -> DataFrame:
    """Stateless per-turn quality on a streaming DataFrame: features +
    scrub + the per-turn rule subset + ``keep_turn``. Append-mode safe
    (pure projection, no aggregation)."""
    df = with_text_features(stream_df)
    df = df.withColumns(
        {
            "lang": langid_udf(F.col("text")),
            "ppl": perplexity_udf(F.col("text")),
            "text_scrubbed": scrub_udf(F.col("text")),
        }
    )
    rules = {k: v for k, v in rule_columns(t).items() if k in STATELESS_RULES}
    df = df.withColumns(rules)
    keep = None
    for name in STATELESS_RULES:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return df.withColumn("keep_turn", keep)


def streaming_interval_stats(
    quality_stream: DataFrame,
    window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window rule stats (streaming mirror of the
    reference's interval aggregation; late rows beyond the watermark are
    dropped deterministically)."""
    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        F.avg(F.col("keep_turn").cast("double")).alias("keep_rate"),
    ]
    for r in STATELESS_RULES:
        aggs.append(F.avg(F.col(r).cast("double")).alias(f"{r}_pass_rate"))
    return (
        quality_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(*aggs)
        .select(F.col("w.start").alias("__time_interval"), *[
            c for c in ["n_turns", "keep_rate"]
        ], *[F.col(f"{r}_pass_rate") for r in STATELESS_RULES])
    )


def streaming_dedup(
    stream_df: DataFrame,
    watermark: str = "2 hours",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    content_hash: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """Streaming deduplication with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and expires
    key state once the watermark passes it — the streaming analog of the
    batch exact-dedup shuffle, with state bounded by (event-time horizon
    × key arrival rate) instead of the full key universe. With
    ``content_hash=True`` the key includes a sha2 digest of the text, so
    re-sent identical turns dedupe while edited re-sends pass through
    (at-least-once upstream delivery → effectively-once downstream).
    """
    keys = list(key_cols)
    df = stream_df
    if content_hash:
        df = df.withColumn(
            "__content_digest", F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
        )
        keys = keys + ["__content_digest"]
    out = df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return out.drop("__content_digest") if content_hash else out


def streaming_conversation_flags(
    quality_stream: DataFrame,
    window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Bounded-state conversation aggregates on a stream: per
    (conv_id, tumbling window) turn counts, first role (min_by turn_idx),
    and turn-index span. Exact adjacent-role reassembly needs ordered
    per-conversation state (``applyInPandasWithState``) or the batch
    path; these windowed aggregates are the early-signal variant with
    watermark-bounded state."""
    return (
        quality_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("conv_n_turns_window"),
            F.min_by("role", "turn_idx").alias("conv_first_role_window"),
            F.min("turn_idx").alias("min_turn_idx"),
            F.max("turn_idx").alias("max_turn_idx"),
            F.avg(F.col("keep_turn").cast("double")).alias("keep_turn_rate"),
        )
        .select(
            F.col("w.start").alias("window_start"), "conv_id",
            "conv_n_turns_window", "conv_first_role_window",
            "min_turn_idx", "max_turn_idx", "keep_turn_rate",
        )
    )


def streaming_sessionize(
    stream_df: DataFrame,
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows on a stream: per-key inactivity-gap sessions with
    watermark-bounded state (a session's state is dropped once the
    watermark passes its close — no unbounded key history). The exact
    operator the batch ``sessionize_events`` query runs; session_window
    merges across micro-batches, so the streaming answer equals the
    batch answer once the source drains (pinned in
    tests/test_multimodal_streaming.py)."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(key, F.session_window("ts", gap).alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(key, "session_start", "session_end", "n_events")
    )
