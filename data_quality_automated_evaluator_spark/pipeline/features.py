"""Feature computation over transcripts: per-turn (map-only, mostly JVM)
and per-conversation (one shuffle by conv_id).

Scale notes (10^12 turns):
- Per-turn features are a pure Project over the scan — no shuffle; text
  heuristics are built-in Catalyst expressions (codegen), langid +
  perplexity are Arrow-batched pandas UDFs (no per-row Python).
- Conversation features need co-location by ``conv_id``. The default
  path is a single window shuffle (``Window.partitionBy(conv_id)``):
  conversations are bounded (≤ ~10^4 turns even for "hot" ones), so a
  partition never explodes. For *aggregation-only* conversation stats,
  :func:`salted_conversation_stats` demonstrates the two-phase salted
  groupBy that breaks hot-key skew when a groupBy(conv_id) feeds a
  wide plan (the partial aggregate on (conv_id, salt) spreads a hot
  conversation over S reducers before the final combine).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.langid import langid_label
from ..functions.perplexity import perplexity_batch
from ..functions.textstats import with_text_features

DEFAULT_SALT_BUCKETS = 16

# DataType instances (not DDL strings) so the UDFs can be defined without an
# active SparkSession (DDL parsing needs a context; DataType objects don't).
langid_udf = F.pandas_udf(langid_label, returnType=T.StringType())
perplexity_udf = F.pandas_udf(perplexity_batch, returnType=T.DoubleType())


def with_turn_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All per-turn features: heuristics (JVM exprs) + langid + ppl (Arrow)."""
    df = with_text_features(df, text_col)
    return df.withColumns(
        {
            "lang": langid_udf(F.col(text_col)),
            "ppl": perplexity_udf(F.col(text_col)),
        }
    )


def with_conversation_features(df: DataFrame) -> DataFrame:
    """Conversation-level features via a single shuffle by conv_id.

    Adds:
    - ``prev_role``        role of the previous turn (by turn_idx)
    - ``conv_n_turns``     total turns in the conversation
    - ``conv_first_role``  role at turn_idx == 0
    - ``conv_role_violation``  any adjacent (user|assistant) pair with
      equal roles anywhere in the conversation
    """
    w_ord = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_all = Window.partitionBy("conv_id")
    df = df.withColumn("prev_role", F.lag("role").over(w_ord))
    adj_violation = (
        F.col("prev_role").isin("user", "assistant")
        & (F.col("role") == F.col("prev_role"))
    ).cast("int")
    df = df.withColumn("_adj_violation", F.coalesce(adj_violation, F.lit(0)))
    df = df.withColumns(
        {
            "conv_n_turns": F.count(F.lit(1)).over(w_all).cast("int"),
            "conv_first_role": F.max(
                F.when(F.col("turn_idx") == 0, F.col("role"))
            ).over(w_all),
            "conv_role_violation": (F.max("_adj_violation").over(w_all) == 1),
        }
    ).drop("_adj_violation")
    return df


def salted_conversation_stats(
    df: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS
) -> DataFrame:
    """Per-conversation aggregate stats via two-phase salted groupBy.

    Phase 1 groups on ``(conv_id, salt)`` where salt = pmod(hash(turn_idx), S)
    so a hot conversation's turns spread over S reducers; phase 2 combines
    the S partials per conversation — the final shuffle moves only
    n_convs × S rows, never raw turns. Use this (not a direct
    groupBy(conv_id)) whenever conversation cardinality is skewed.

    Returns one row per conv_id: n_turns, n_roles (exact), first_ts,
    last_ts, total_chars.

    ``n_roles`` is EXACT despite the salting: roles are a tiny enum, so
    phase 1 collects the per-(conv, salt) distinct-role SET (bounded by
    |enum|, not by turns) and phase 2 merges ≤ S bounded sets per
    conversation — unlike a per-bucket ``approx_count_distinct`` whose
    ``max`` across buckets is only a lower bound (roles split across
    salt buckets are never combined). The set-merge stays O(S·|enum|)
    per conversation regardless of conversation size.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.col("turn_idx")), F.lit(salt_buckets))
    )
    partial = salted.groupBy("conv_id", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.collect_set("role").alias("_roles"),
        F.min("ts").alias("_min_ts"),
        F.max("ts").alias("_max_ts"),
        F.sum(F.length("text").cast("long")).alias("_chars"),
    )
    return partial.groupBy("conv_id").agg(
        F.sum("_n").cast("int").alias("n_turns"),
        F.size(F.array_distinct(F.flatten(F.collect_list("_roles"))))
        .cast("int")
        .alias("n_roles"),
        F.min("_min_ts").alias("first_ts"),
        F.max("_max_ts").alias("last_ts"),
        F.sum("_chars").alias("total_chars"),
    )
