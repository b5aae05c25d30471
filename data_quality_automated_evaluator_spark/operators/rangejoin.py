"""Range (interval) join — point-in-interval matching without the
nested-loop trap.

Spark has no native range join: expressing ``p.ts >= i.start AND
p.ts < i.end`` as a join condition (with or without an equi-key) plans a
BroadcastNestedLoopJoin / CartesianProduct whose cost is
O(|points| x |intervals|) predicate evaluations — unusable at 10^12
points. (Databricks' closed-source runtime adds a range-join hint for
this exact reason; open-source Spark needs the decomposition below.)

Bucket decomposition, the standard open-source answer (same family as
the IEJoin literature and Flink's interval join): pick a bucket width
``W``; each interval explodes into the W-buckets it overlaps, each point
computes its single containing bucket, and the join becomes a plain hash
equi-join on (keys..., bucket) followed by the exact range predicate as
a post-filter.

    intervals:  bucket = sequence(floor(start/W), floor((end-1)/W))
    points:     bucket = floor(ts/W)
    join on keys + [bucket], then filter start <= ts < end

Correctness needs no dedup: a point lies in exactly ONE bucket, so each
(point, interval) pair can meet at most once — no distinct pass, no
row_id bookkeeping.

Scale shape at 100 TB:
- shuffle is hash on (keys..., bucket) — the same plan family as any
  equi-join, AQE-broadcastable when the exploded interval side is small
  (promo/config/campaign tables always are), skew-splittable otherwise;
- the interval side grows by the explosion factor
  ``ceil(len/W) + 1`` — choose W near the median interval length so the
  factor stays O(1); points never replicate;
- the post-filter runs inside whole-stage codegen right after the join,
  so mismatched same-bucket pairs die before any downstream exchange.

Reference parity: the reference evaluator has no range join; this is
part of the training-data-pipeline extension surface (task brief), with
DuckDB's native inequality join as the value oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_points"]


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_width_seconds: int = 86400,
) -> DataFrame:
    """Inner-join each point row to every interval row (same ``keys``)
    whose half-open window ``[start, end)`` contains ``point_ts``.

    Returns the combined row (all point columns + all interval columns
    minus the join keys' duplicates). ``bucket_width_seconds`` tunes the
    interval explosion factor — set it near the typical interval length.
    """
    w = int(bucket_width_seconds)
    if w <= 0:
        raise ValueError(f"bucket_width_seconds must be positive, got {w}")

    def _us(col: Column) -> Column:
        # microsecond arithmetic: unix_timestamp() truncates to whole
        # seconds, which would mis-bucket fractional-second boundaries.
        # unix_micros rejects TIMESTAMP_NTZ, so cast first — points and
        # intervals go through the same cast, so buckets stay aligned.
        return F.unix_micros(col.cast("timestamp"))

    def _b(col: Column) -> Column:
        return F.floor(_us(col) / F.lit(w * 1_000_000)).cast("long")

    ivl = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                _b(F.col(start)),
                # end is exclusive: the last covered instant is end-1µs,
                # so an interval ending exactly ON a bucket boundary does
                # not reach into the next bucket, while one ending a
                # fraction of a second past it still claims that bucket
                F.floor(
                    (_us(F.col(end)) - F.lit(1)) / F.lit(w * 1_000_000)
                ).cast("long"),
            )
        ),
    )
    pts = points.withColumn("_bucket", _b(F.col(point_ts)))
    cond = [pts[k] == ivl[k] for k in keys] + [pts["_bucket"] == ivl["_bucket"]]
    joined = (
        pts.join(ivl, cond, "inner")
        .filter(
            (pts[point_ts] >= ivl[start]) & (pts[point_ts] < ivl[end])
        )
        .drop(ivl["_bucket"])
        .drop(pts["_bucket"])
    )
    for k in keys:
        joined = joined.drop(ivl[k])
    return joined
