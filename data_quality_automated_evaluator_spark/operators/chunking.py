"""Document → training-chunk splitting (token windows with overlap).

A large-scale pretraining pipeline rarely feeds whole documents to the
tokenizer — it splits them into bounded token windows (context-length
budgeting) with a configurable overlap so no boundary context is lost.
This is the standard "chunking" stage between cleaning/dedup and
tokenization.

Spark-first shape: 100% Catalyst array expressions inside the scan
projection — ``split`` → ``filter`` (drop empty tokens) → ``sequence``
of window starts → ``transform`` + ``slice`` + ``concat_ws`` →
``posexplode``. No UDF, no shuffle: chunking is map-only, so at 10^12
documents the plan stays scan → project → explode → sink, and the
explode fan-out is bounded by ceil(n_tokens/stride) per row.

Exactly reproducible in SQL (DuckDB list functions mirror every step),
so the driver value-checks it end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["chunk_documents", "pack_chunks"]


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, chunk): ``(id_col, chunk_idx, chunk_text,
    n_chunk_tokens)``.

    Windows are ``chunk_tokens`` whitespace tokens advancing by
    ``chunk_tokens - overlap``; the final window may be shorter; docs
    with zero tokens emit no chunks. ``overlap`` must be smaller than
    ``chunk_tokens`` (stride must advance) — validated eagerly.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    n = F.size(toks)
    # window start offsets 0, stride, 2*stride, ... < n_tokens
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens)),
    )
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .withColumn(
            "n_chunk_tokens",
            F.size(F.split(F.col("chunk_text"), r"\s+")).cast("int"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    capacity: int = 2048,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Greedy concat packing: assign every chunk its position in the
    infinite token stream formed by concatenating chunks in
    ``(id_col, idx_col)`` order, then cut that stream into
    ``capacity``-token packs — the standard sequence-packing stage that
    turns cleaned chunks into fixed-context training rows. Output adds
    ``pack_id`` (which pack the chunk STARTS in) and ``pack_offset``
    (its token offset within that pack).

    Scale shape — a naive global ordered window would funnel the whole
    corpus through ONE sort partition; instead this is the classic
    distributed prefix sum: ``repartitionByRange`` on the (unique) sort
    key keeps the global order across partitions, a per-partition
    window computes bounded local running sums, and the per-partition
    TOTALS (#partitions rows — metadata-sized) are prefix-summed on the
    driver and broadcast back. Two jobs over the chunk table, no
    single-reducer stage. The ordered frame is checkpointed so the two
    passes share one materialization.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    spark = chunks.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    ordered = (
        chunks.repartitionByRange(n_parts, F.col(id_col), F.col(idx_col))
        .localCheckpoint(eager=False)
    )
    ordered = ordered.withColumn("_pid", F.spark_partition_id())
    totals = {
        r["_pid"]: r["t"]
        for r in ordered.groupBy("_pid")
        .agg(F.sum(tokens_col).alias("t"))
        .collect()
    }
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    offsets = spark.createDataFrame(
        [(pid, int(off)) for pid, off in prefix.items()] or [(0, 0)],
        "_pid int, _part_offset long",
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col, idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(
        F.sum(F.col(tokens_col).cast("long")).over(w), F.lit(0)
    )
    return (
        ordered.withColumn("_local_before", local_before)
        .join(F.broadcast(offsets), "_pid")
        .withColumn("_before", F.col("_local_before") + F.col("_part_offset"))
        .withColumn(
            "pack_id", F.floor(F.col("_before") / capacity).cast("long")
        )
        .withColumn(
            "pack_offset", (F.col("_before") % capacity).cast("int")
        )
        .drop("_pid", "_local_before", "_part_offset", "_before")
    )
