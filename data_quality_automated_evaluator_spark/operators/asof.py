"""As-of (temporal) join — a custom operator Spark's DataFrame API lacks.

For every left row, attach the most recent right row with
``right_ts <= left_ts`` for the same key (backward direction; the
classic "state as of event time" join: model version in effect for a
turn, price in effect for a trade, config in effect for a session).

Spark-first implementation — NOT the naive range join (which explodes
to O(left × right-per-key) intermediate rows and a per-row max): the
two sides are UNIONED as tagged events and a single ordered window per
key carries the latest right payload forward:

    union → one shuffle by key → in-partition sort by (ts, side) →
    last(payload, ignorenulls) over rows UNBOUNDED PRECEDING..CURRENT

Cost is one Exchange + one sort over |left| + |right| rows — the same
plan family Spark uses for any window, with no join blow-up; ties
(right_ts == left_ts) match because right events sort BEFORE left
events at equal timestamps, mirroring DuckDB's native ASOF JOIN
semantics (``l.ts >= r.ts``), which serves as the value oracle.

Skew note: one hot key serializes its window into one task, like every
per-key ordered operator; keys here are entity ids (users,
conversations) whose per-key row counts are bounded in practice —
pre-filter or split pathological keys upstream.

NULL keys: SQL join semantics (and DuckDB's native ASOF JOIN, the
oracle) never match NULL keys — but ``Window.partitionBy`` groups NULL
keys into one partition, which would incorrectly carry NULL-key right
rows onto NULL-key left rows. The match is therefore nulled out for
NULL-key left rows (they survive with no match, like any unmatched
left row in a left join).

Shuffle-width note: the union shuffles |L|+|R| rows at the COMBINED
schema width (left columns are NULL-padded onto right rows). The
alternative — shuffle only (key, ts, side, payload, row_id) and
re-join matches to the left by row_id — shrinks that exchange but
adds a second full Exchange of the wide left table on row_id. For the
shapes this operator serves (right side is a dim-like state table,
|R| << |L|), the padded width costs ~|R| × left_width of extra
shuffle while the re-join would cost a full |L| × left_width second
shuffle — the single-shuffle union wins. Revisit only when |R| ≈ |L|
AND the left table is very wide; Tungsten null bitmaps make the
padded NULLs nearly free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join_backward"]


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of-backward join; every left row appears exactly once.

    ``payload_cols`` (default: all right columns except key+ts) arrive
    as ``<col><suffix>``; ``<right_ts><suffix>`` always arrives (NULL =
    no match). ``tolerance_seconds`` drops matches older than
    ``left_ts - tolerance``.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (on, right_ts)]

    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.struct(
            F.col(right_ts).cast("timestamp").alias("_rts"),
            *[F.col(c) for c in payload_cols],
        ).alias("_payload"),
        *[F.lit(None).cast(t.dataType).alias(f"_l_{t.name}")
          for t in left.schema.fields],
    )
    l = left.select(  # noqa: E741
        F.col(on).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # right sorts BEFORE left at equal ts → ties match (DuckDB ASOF parity)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_is_right") == 0)
        # NULL keys never match (equi-join / DuckDB ASOF semantics);
        # without this, the NULL-key window partition would carry
        # NULL-key right payloads onto NULL-key left rows.
        .withColumn(
            "_match", F.when(F.col("_k").isNotNull(), F.col("_match"))
        )
    )
    if tolerance_seconds is not None:
        carried = carried.withColumn(
            "_match",
            F.when(
                F.col("_match._rts")
                >= F.col("_ts") - F.expr(f"INTERVAL {tolerance_seconds} SECONDS"),
                F.col("_match"),
            ),
        )
    return carried.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        F.col("_match._rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
