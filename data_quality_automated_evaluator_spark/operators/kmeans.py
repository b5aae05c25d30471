"""Distributed Lloyd's k-means (iterative broadcast refinement).

``operators/similarity.train_ivf_centroids`` trains IVF centroids from a
bounded driver-side sample — the right default.  When even the training
sample must stay distributed (billions of embeddings, privacy rules that
forbid collecting vectors), the canonical Spark shape is MLlib's:
broadcast the k·d centroid matrix, assign map-only, re-aggregate means,
repeat.  This module implements that loop in PURE Catalyst — zero
Python in the hot path:

* **assignment**: squared-L2 distance to each centroid is
  ``aggregate(zip_with(v, c, (a,b) -> (a-b)²), sum)`` and the winning
  cell is ``array_min`` over ``struct(dist, cell)`` (struct ordering =
  min distance, ties to the lowest cell id) — all inside whole-stage
  codegen, no UDF, no shuffle.
* **update**: ``posexplode`` the vector components and aggregate
  ``avg`` per (cell, position) — k·d groups with map-side partial
  aggregation, then a bounded O(k·d) driver collect to build the next
  broadcast.  One job per iteration.

Centroids are rounded to 6 decimals between iterations *inside the
engine* (Spark and DuckDB both round half-away-from-zero; Python's
banker's rounding never touches the values), which pins the fixpoint
enough to make the whole iterative algorithm value-checkable against a
CTE-unrolled DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_assign_col", "kmeans_fit", "kmeans_stats"]


def _sq_dist(centroid: list[float], v: Column) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign_col(centroids: list[list[float]], v: Column) -> Column:
    """Winning cell id for vector column ``v`` — min squared-L2 distance,
    ties to the lowest cell id. Pure codegen expression."""
    options = F.array(
        *[
            F.struct(_sq_dist(c, v).alias("d"), F.lit(i).alias("c"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_min(options)["c"]


def _collect_centroids(stats: DataFrame, k: int, dim: int) -> list[list[float]]:
    rows = stats.collect()  # bounded: k * dim rows
    out: list[list[float]] = [[0.0] * dim for _ in range(k)]
    for r in rows:
        out[r["cell"]][r["pos"]] = r["c"]
    # empty cells keep a zero centroid AT THEIR INDEX (deterministic;
    # matches the oracle, which simply emits no rows for them) — never
    # compacted, so cell id i denotes the same centroid in every Lloyd
    # round and in the caller's final assignment pass
    return out


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Run ``iters`` Lloyd updates and return the rounded centroids.

    Init is the first ``k`` vectors in ``id_col`` order (deterministic
    across runs/partitionings; k is tiny so the ordered limit is a
    bounded driver fetch, not a global sort of the corpus).
    """
    if k < 1 or iters < 1:
        raise ValueError("require k >= 1 and iters >= 1")
    v = F.col(vec_col).cast("array<double>")
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.transform(v, lambda x: F.round(x, 6)).alias("c"))
        .collect()
    )
    centroids = [list(r["c"]) for r in init]
    dim = len(centroids[0])
    base = df.select(v.alias("_v"))
    for _ in range(iters):
        assigned = base.withColumn("_cell", kmeans_assign_col(centroids, F.col("_v")))
        stats = (
            assigned.select("_cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy(F.col("_cell").alias("cell"), "pos")
            .agg(F.round(F.avg("x"), 6).alias("c"))
        )
        centroids = _collect_centroids(stats, k, dim)
    return centroids


def kmeans_stats(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Fit with ``iters - 1`` full updates, then return the FINAL
    assignment's per-(cell, position) means and member counts as a
    DataFrame: ``(cell, pos, centroid_val, n_members)`` — i.e. the
    ``iters``-th centroid update left distributed instead of collected.
    """
    centroids = (
        kmeans_fit(df, k=k, iters=iters - 1, vec_col=vec_col, id_col=id_col)
        if iters > 1
        else None
    )
    v = F.col(vec_col).cast("array<double>")
    if centroids is None:  # single iteration: assign under the init
        init = (
            df.orderBy(id_col)
            .limit(k)
            .select(F.transform(v, lambda x: F.round(x, 6)).alias("c"))
            .collect()
        )
        centroids = [list(r["c"]) for r in init]
    assigned = df.select(v.alias("_v")).withColumn(
        "_cell", kmeans_assign_col(centroids, F.col("_v"))
    )
    return (
        assigned.select("_cell", F.posexplode("_v").alias("pos", "x"))
        .groupBy(F.col("_cell").alias("cell"), "pos")
        .agg(
            F.round(F.avg("x"), 6).alias("centroid_val"),
            F.count("*").alias("n_members"),
        )
        .select("cell", "pos", "centroid_val", "n_members")
    )
