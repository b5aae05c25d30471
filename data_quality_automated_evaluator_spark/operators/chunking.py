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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


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
