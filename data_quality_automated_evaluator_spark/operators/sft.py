"""SFT training-batch preparation over conversation transcripts.

Two stages a supervised-fine-tuning data pipeline needs between the
quality filter and the trainer, neither present in the reference
evaluator (a single-table QA tool — this is part of the LLM-pipeline
extension surface):

- :func:`turn_loss_spans` — per-turn token spans within each rendered
  conversation plus the loss mask (train on assistant turns only).
  Pure Catalyst: one window prefix-sum partitioned by ``conv_id`` —
  a single Exchange on the conversation key, the same shuffle shape
  as conversation reassembly, so it rides the pipeline's existing
  partitioning at 10^12 turns.

- :func:`pack_conversations` — ATOMIC greedy packing of whole
  conversations into fixed-capacity token bins (a conversation never
  splits across packs — the SFT counterpart of the streaming
  ``pack_chunks``, which cuts mid-document).  Greedy bin-close is a
  sequential recurrence, so it cannot be a prefix sum; instead
  conversations are dealt into ``n_buckets`` deterministic md5-Horner
  buckets (the content-stable hash of :mod:`.splits` — re-runs and
  late shards land identically, no RNG) and the exact greedy runs
  WITHIN each bucket via ``applyInPandas``.  Each task sees only
  |convs| / n_buckets conversation-level rows (id + token count — no
  text, no turns), so state is O(bucket) and buckets scale with the
  cluster; pack ids are namespaced per bucket.  At 10^12 turns the
  conversation-level frame is ~9 orders of magnitude smaller than the
  turn table, and the only shuffle is the bucket-keyed Exchange.

Token counts are whitespace tokens (non-empty ``\\s+`` pieces — the
convention every text-stats oracle in this repo shares) plus a fixed
``turn_overhead`` per turn for the chat template's role header/footer.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "turn_loss_spans",
    "pack_conversations",
    "pack_conversations_oracle_sql",
    "truncate_to_context",
]

_HEX = "0123456789abcdef"


def _ws_tokens(col: Column) -> Column:
    """Non-empty whitespace-split token count (int)."""
    return F.size(
        F.filter(F.split(col, r"\s+"), lambda x: x != F.lit(""))
    ).cast("int")


def _bucket(key: Column, n_buckets: int) -> Column:
    """Content-stable bucket: first 4 md5 nibbles Horner-folded mod n.

    Identical construct to :func:`.splits.split_column` — evaluates the
    same in Spark SQL and DuckDB.
    """
    h = F.md5(key.cast("string"))
    v = F.lit(0)
    for i in range(1, 5):
        v = v * 16 + (F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1)
    return (v % n_buckets).cast("int")


def turn_loss_spans(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    turn_overhead: int = 2,
    loss_roles: Iterable[str] = ("assistant",),
) -> DataFrame:
    """Per-turn token spans + loss mask within each conversation.

    A turn renders as ``turn_overhead + n_text_tokens`` tokens;
    ``tok_start``/``tok_end`` are its half-open span in the
    concatenation of the conversation's turns in ``idx_col`` order.
    ``in_loss`` marks roles the trainer computes loss on;
    ``loss_tokens`` counts only the text tokens (template overhead is
    always masked out).
    """
    if turn_overhead < 0:
        raise ValueError("turn_overhead must be >= 0")
    rendered = F.col("n_text_tokens") + F.lit(turn_overhead)
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(conv_col).alias("conv_id"),
            F.col(idx_col).alias("turn_idx"),
            F.col(role_col).alias("role"),
            _ws_tokens(F.col(text_col)).alias("n_text_tokens"),
        )
        .withColumn(
            "tok_start",
            F.coalesce(F.sum(rendered.cast("long")).over(w), F.lit(0)).cast(
                "long"
            ),
        )
        .withColumn(
            "tok_end", (F.col("tok_start") + rendered.cast("long")).cast("long")
        )
        .withColumn(
            "in_loss",
            F.col("role").isin(*loss_roles).cast("int"),
        )
        .withColumn(
            "loss_tokens",
            (F.col("in_loss") * F.col("n_text_tokens")).cast("int"),
        )
    )


_PACK_SCHEMA = (
    "conv_id string, bucket int, pack_id int, pack_offset bigint, "
    "n_conv_tokens bigint"
)


def pack_conversations(
    df: DataFrame,
    capacity: int = 512,
    n_buckets: int = 16,
    conv_col: str = "conv_id",
    text_col: str = "text",
    turn_overhead: int = 2,
) -> DataFrame:
    """Atomic greedy packing of conversations into ``capacity``-token
    bins, exact within each deterministic bucket.

    Greedy rule (per bucket, conversations in ``conv_id`` order): a
    conversation opens a new pack iff the current pack is non-empty and
    would overflow; an oversize conversation (> capacity tokens) sits
    alone in its pack and forces the next conversation onto a fresh
    one.  Output: ``(conv_id, bucket, pack_id, pack_offset,
    n_conv_tokens)`` with ``pack_id`` bucket-local.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    convs = (
        df.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(
            F.sum(
                (_ws_tokens(F.col(text_col)) + F.lit(turn_overhead)).cast(
                    "long"
                )
            ).alias("n_conv_tokens")
        )
        .withColumn("bucket", _bucket(F.col("conv_id"), n_buckets))
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("conv_id").reset_index(drop=True)
        packs, offsets = [], []
        pack, fill = 0, 0
        for n in pdf["n_conv_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > capacity:
                pack += 1
                fill = 0
            packs.append(pack)
            offsets.append(fill)
            fill += n
        pdf["pack_id"] = pd.Series(packs, dtype="int32")
        pdf["pack_offset"] = pd.Series(offsets, dtype="int64")
        return pdf[
            ["conv_id", "bucket", "pack_id", "pack_offset", "n_conv_tokens"]
        ]

    return convs.groupBy("bucket").applyInPandas(_greedy, _PACK_SCHEMA)


def pack_conversations_oracle_sql(
    path: str,
    capacity: int = 512,
    n_buckets: int = 16,
    turn_overhead: int = 2,
) -> str:
    """DuckDB twin: same md5-Horner bucket, exact greedy via a bounded
    recursive CTE stepping one conversation per bucket per iteration
    (depth = max bucket population)."""
    nib = lambda i: f"(instr('{_HEX}', substring(h, {i}, 1)) - 1)"  # noqa: E731
    horner = (
        f"((({nib(1)} * 16 + {nib(2)}) * 16 + {nib(3)}) * 16 + {nib(4)})"
    )
    ovf = f"(s.fill > 0 AND s.fill + t.n > {capacity})"
    return f"""
    WITH RECURSIVE convs AS (
      SELECT conv_id,
             CAST(SUM(CAST(len(list_filter(
                     string_split_regex(text, '\\s+'), x -> x <> ''))
                   AS BIGINT) + {turn_overhead}) AS BIGINT) AS n
      FROM read_parquet('{path}') GROUP BY conv_id
    ),
    bucketed AS (
      SELECT conv_id, n, CAST({horner} % {n_buckets} AS INT) AS bucket
      FROM (SELECT conv_id, n, md5(conv_id) AS h FROM convs)
    ),
    t AS (
      SELECT conv_id, n, bucket,
             row_number() OVER (PARTITION BY bucket ORDER BY conv_id) AS rn
      FROM bucketed
    ),
    state AS (
      SELECT bucket, rn, conv_id, n,
             0 AS pack_id, CAST(0 AS BIGINT) AS pack_offset, n AS fill
      FROM t WHERE rn = 1
      UNION ALL
      SELECT t.bucket, t.rn, t.conv_id, t.n,
             CASE WHEN {ovf} THEN s.pack_id + 1 ELSE s.pack_id END,
             CAST(CASE WHEN {ovf} THEN 0 ELSE s.fill END AS BIGINT),
             CASE WHEN {ovf} THEN t.n ELSE s.fill + t.n END
      FROM state s JOIN t ON t.bucket = s.bucket AND t.rn = s.rn + 1
    )
    SELECT conv_id, bucket, CAST(pack_id AS INT) AS pack_id,
           pack_offset, n AS n_conv_tokens
    FROM state ORDER BY conv_id
    """


def truncate_to_context(
    df: DataFrame,
    capacity: int = 2048,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    turn_overhead: int = 2,
) -> DataFrame:
    """Crop each conversation to its trailing whole turns that fit a
    ``capacity``-token context window (the standard SFT policy: recent
    turns carry the training signal, whole turns only — a split turn
    would orphan its template markup).  The final turn is always kept,
    even if it alone exceeds the budget (the trainer hard-truncates
    inside it).  Kept turns are re-based: ``tok_start``/``tok_end``
    are offsets within the TRUNCATED rendering.

    Scale shape: two window passes over the same conv_id partitioning
    (suffix sum + kept-total), one Exchange total — rides the
    pipeline's conversation partitioning; no text shuffles beyond the
    rows themselves, and the filter drops pre-window history before
    any downstream stage sees it.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    rendered = (F.col("n_text_tokens") + F.lit(turn_overhead)).cast("long")
    wdesc = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(idx_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wconv = Window.partitionBy(conv_col)
    t = (
        df.select(
            F.col(conv_col).alias("conv_id"),
            F.col(idx_col).alias("turn_idx"),
            F.col(role_col).alias("role"),
            _ws_tokens(F.col(text_col)).alias("n_text_tokens"),
        )
        .withColumn("suffix_tokens", F.sum(rendered).over(wdesc))
        .withColumn("max_idx", F.max("turn_idx").over(wconv))
        .where(
            (F.col("suffix_tokens") <= capacity)
            | (F.col("turn_idx") == F.col("max_idx"))
        )
        .withColumn("kept_total", F.max("suffix_tokens").over(wconv))
    )
    return t.select(
        "conv_id",
        "turn_idx",
        "role",
        "n_text_tokens",
        (F.col("kept_total") - F.col("suffix_tokens")).alias("tok_start"),
        (
            F.col("kept_total")
            - F.col("suffix_tokens")
            + F.col("n_text_tokens")
            + F.lit(turn_overhead)
        ).alias("tok_end"),
    )


def truncate_to_context_oracle_sql(
    path: str, capacity: int = 2048, turn_overhead: int = 2
) -> str:
    """DuckDB twin of :func:`truncate_to_context`."""
    return f"""
    WITH t AS (
      SELECT conv_id, turn_idx, role,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS INT) AS n_text_tokens
      FROM read_parquet('{path}')
    ),
    s AS (
      SELECT conv_id, turn_idx, role, n_text_tokens,
             SUM(CAST(n_text_tokens AS BIGINT) + {turn_overhead}) OVER (
               PARTITION BY conv_id ORDER BY turn_idx DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS suffix_tokens,
             MAX(turn_idx) OVER (PARTITION BY conv_id) AS max_idx
      FROM t
    ),
    kept AS (
      SELECT *, MAX(suffix_tokens) OVER (PARTITION BY conv_id) AS kept_total
      FROM s
      WHERE suffix_tokens <= {capacity} OR turn_idx = max_idx
    )
    SELECT conv_id, turn_idx, role, n_text_tokens,
           CAST(kept_total - suffix_tokens AS BIGINT) AS tok_start,
           CAST(kept_total - suffix_tokens + n_text_tokens
                + {turn_overhead} AS BIGINT) AS tok_end
    FROM kept ORDER BY conv_id, turn_idx
    """
