"""Embedding-column health audit: broken-encoder and collapse detection.

A 100-TB embedding corpus is produced by fleets of encoder workers; the
two failure modes that silently poison every downstream consumer
(ANN, SemDeDup, k-means, PQ) are

* **dead vectors** — a crashed/fallback worker emits all-zero or
  NaN/Inf embeddings for whole shards, and
* **representation collapse** — a mis-trained or truncated encoder maps
  everything near one direction, so cosine similarity stops separating
  documents.

This operator reports, per group (e.g. encoder version / source label):
``n_vecs``, ``n_zero`` (exact all-zero vectors), ``n_nonfinite`` (any
NaN element), ``avg_norm`` / ``min_norm`` / ``max_norm`` over healthy
vectors, and ``collapse_ratio`` = ||mean healthy vector|| / mean norm —
~0 for isotropic centered embeddings, → 1 when the group collapses onto
a single direction.

It extends the reference evaluator's per-column health statistics
(reference preprocess.py:218 null ratio, :225-229 min/max/mean/std) to
the ``array<float>`` column type the reference's flat model lacks.

Spark-first shape (holds at 10^12 rows):

* Per-row work (defect flags, squared-norm fold) is a map-only
  ``Project`` of Catalyst higher-order functions (``exists``,
  ``aggregate``) — whole-stage codegen, no Python, no explode.
* ONE ``groupBy(group)`` HashAggregate carries every statistic,
  including the per-dimension component sums needed for the mean
  vector: ``2 + 5 + dim`` agg expressions with map-side partials
  (the sq_train trick, operators/quantize.py) — never a
  ``posexplode`` that would shuffle ``rows x dim`` entries.
* Every float that crosses the shuffle is quantized to integer
  micro-units (``CAST(round(x * 1e6) AS BIGINT)``) and summed in exact
  BIGINT arithmetic, so the result is shuffle-order-proof — the same
  trick as functions/textstats.zipf_slope_stats and
  operators/distdrift.psi_drift.  ``round()`` is half-away-from-zero
  in both Spark and DuckDB (see operators/quantize.py), so the DuckDB
  oracle replays the quantization exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["embedding_health"]

#: integer quantization scale for the order-proof norm / component sums
_MICRO = 1_000_000


def embedding_health(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """Per-group embedding health frame (one row per group).

    Output columns: ``(group_col, n_vecs, n_zero, n_nonfinite,
    avg_norm, min_norm, max_norm, collapse_ratio)``, ordered by group.
    ``avg_norm``/``collapse_ratio`` are NULL for a group with no
    healthy vectors.
    """
    v = F.col(vec_col)
    # any NaN element marks the vector non-finite (map-only codegen)
    bad = F.exists(v, lambda x: F.isnan(x))
    # squared L2 norm: left fold in double, identical order both engines
    n2 = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    rows = df.select(
        F.col(group_col).alias("grp"), v.alias("v"),
        bad.alias("bad"), n2.alias("n2"),
    )

    healthy = (~F.col("bad")) & (F.col("n2") > 0)
    norm = F.sqrt(F.col("n2"))
    qnorm = F.round(norm * _MICRO).cast("long")

    aggs = [
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(((~F.col("bad")) & (F.col("n2") == 0)).cast("long")).alias(
            "n_zero"
        ),
        F.sum(F.col("bad").cast("long")).alias("n_nonfinite"),
        F.sum(healthy.cast("long")).alias("n_healthy"),
        F.sum(F.when(healthy, qnorm).otherwise(F.lit(0))).alias("qn_sum"),
        F.min(F.when(healthy, F.round(norm, 6))).alias("min_norm"),
        F.max(F.when(healthy, F.round(norm, 6))).alias("max_norm"),
    ]
    for i in range(1, dim + 1):
        qi = F.round(
            F.element_at(F.col("v"), i).cast("double") * _MICRO
        ).cast("long")
        aggs.append(
            F.sum(F.when(healthy, qi).otherwise(F.lit(0))).alias(f"s{i}")
        )
    g = rows.groupBy("grp").agg(*aggs)

    nh = F.col("n_healthy").cast("double")
    avg_norm = F.col("qn_sum") / nh / _MICRO
    # ||mean vector||^2: left-associated sum over dims, the same explicit
    # arithmetic tree the oracle writes out
    mean2 = None
    for i in range(1, dim + 1):
        m = F.col(f"s{i}") / nh / _MICRO
        term = m * m
        mean2 = term if mean2 is None else mean2 + term
    guard = F.col("n_healthy") > 0
    return (
        g.select(
            F.col("grp").alias(group_col),
            "n_vecs",
            "n_zero",
            "n_nonfinite",
            F.when(guard, F.round(avg_norm, 6)).alias("avg_norm"),
            "min_norm",
            "max_norm",
            F.when(guard, F.round(F.sqrt(mean2) / avg_norm, 6)).alias(
                "collapse_ratio"
            ),
        )
        .orderBy(group_col)
    )
