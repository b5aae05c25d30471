"""Bucketed conversation store: the zero-shuffle layout for transcripts.

``run_quality_pipeline`` pays exactly one wide shuffle — the
conversation window over ``conv_id``. At 10^12 turns that shuffle moves
the whole corpus once per run. Storing turns **bucketed by conv_id,
sorted by (conv_id, turn_idx)** amortizes it: the bucketed scan's
output partitioning already satisfies the window's distribution
requirement, so every subsequent pipeline run, metric backfill, or
conversation-level experiment plans with ZERO Exchange nodes
(plan-gated in ``tests/test_bucketed_pipeline.py``).

Two ordering facts shape :func:`quality_pipeline_colocated`
(probe-verified on Spark 4.1):

- a window directly over the bucketed scan plans with no Exchange and
  only an intra-partition Sort (the ``sortBy`` files make that sort
  cheap);
- ``ArrowEvalPython`` does NOT propagate its child's partitioning, so
  the per-turn pandas UDFs (langid / perplexity / scrub) must run
  AFTER the conversation window, not before it as in the default
  pipeline — they are per-row features, so the reorder is
  semantics-free.

The Iceberg analog of this layout is a table partitioned/ordered by
``bucket(N, conv_id), turn_idx``; the parquet ``bucketBy`` catalog
table is the sandbox-runnable equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .features import with_conversation_features, with_turn_features
from .quality import scrub_udf
from .rules import Thresholds, with_rules

DEFAULT_BUCKETS = 64


def write_bucketed_turns(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Materialize a transcript frame as the bucketed store.

    One hash shuffle by ``conv_id`` at write time (the last one this
    data ever needs); files are per-bucket and internally sorted by
    (conv_id, turn_idx), so reads expose both the partitioning and a
    useful within-bucket order.
    """
    (
        df.repartition(n_buckets, "conv_id")
        .write.mode(mode)
        .bucketBy(n_buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_turns(spark: SparkSession, table: str) -> DataFrame:
    """The store as a DataFrame (must go through the catalog — a plain
    ``spark.read.parquet`` of the same files loses the bucket spec and
    with it the shuffle elision)."""
    return spark.table(table)


def quality_pipeline_colocated(
    df: DataFrame,
    thresholds: Thresholds = Thresholds(),
    keep_text: bool = False,
) -> DataFrame:
    """``run_quality_pipeline`` semantics, ordered for a conv_id-bucketed
    input: conversation window first (no Exchange over a bucketed scan),
    then the Arrow-batched per-turn features and scrub (map-only), then
    rules. Output columns match ``run_quality_pipeline`` row-for-row."""
    df = with_conversation_features(df)
    df = with_turn_features(df)
    df = df.withColumn("text_scrubbed", scrub_udf(F.col("text")))
    if not keep_text:
        df = df.drop("text")
    return with_rules(df, thresholds)
