"""Robust interval statistics: exact trimmed and winsorized means.

The reference's stage-2 evaluation flags outliers with IQR/z masks
(reference evaluate.py; this repo's operators/evaluate.py).  The robust
complement is to report interval means that outliers cannot drag: the
α-trimmed mean (drop the k = floor(α·n) smallest and largest values)
and the winsorized mean (clamp them to the surviving extremes).

Exactness: trimming is defined by *integer ranks*, not quantile
interpolation — ``row_number`` over (value, id) with a deterministic id
tiebreak, against the partition count.  Equal values are fungible in
both statistics, so the tiebreak never changes the result; there is no
percentile-interpolation seam between engines, which is what makes this
value-checkable where a ``percentile_cont``-based trim would not be.

Spark-first shape: the rank window and the final ``groupBy`` share the
same (group, interval) partitioning, so Catalyst plans ONE Exchange; at
10^12 rows the windows parallelize across the (type × day) grid and no
partition sees more than one interval's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["trimmed_interval_stats", "trimmed_oracle_sql"]


def trimmed_interval_stats(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_col: str,
    id_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Per (group, day): n, mean, α-trimmed mean, winsorized mean."""
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    rows = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col), day, F.col(value_col).alias("v"), F.col(id_col)
    )
    wp = Window.partitionBy(group_col, "day")
    w = wp.orderBy("v", id_col)
    ranked = (
        rows.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .withColumn("k", F.floor(F.col("n") * F.lit(float(alpha))))
    )
    kept = (F.col("rn") > F.col("k")) & (
        F.col("rn") <= F.col("n") - F.col("k")
    )
    return (
        ranked.groupBy(group_col, "day")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(
                F.sum(F.when(kept, F.col("v")))
                / (F.max("n") - 2 * F.max("k")),
                6,
            ).alias("trimmed_mean"),
            F.round(
                (
                    F.sum(F.when(kept, F.col("v")))
                    + F.max("k") * F.min(F.when(kept, F.col("v")))
                    + F.max("k") * F.max(F.when(kept, F.col("v")))
                )
                / F.max("n"),
                6,
            ).alias("winsorized_mean"),
        )
        .orderBy(group_col, "day")
    )


def trimmed_oracle_sql(
    table: str,
    value: str,
    ts: str,
    group: str,
    id_: str,
    alpha: float = 0.05,
) -> str:
    """DuckDB twin of :func:`trimmed_interval_stats` (same expressions)."""
    return f"""
    WITH rows_ AS (
      SELECT {group} AS g, date_trunc('day', {ts}) AS day,
             {value} AS v, {id_} AS id
      FROM {table} WHERE {value} IS NOT NULL
    ),
    ranked AS (
      SELECT g, day, v,
             row_number() OVER (PARTITION BY g, day ORDER BY v, id) AS rn,
             count(*) OVER (PARTITION BY g, day) AS n
      FROM rows_
    ),
    flagged AS (
      SELECT g, day, v, n,
             CAST(floor(n * {float(alpha)}) AS BIGINT) AS k,
             rn > CAST(floor(n * {float(alpha)}) AS BIGINT)
               AND rn <= n - CAST(floor(n * {float(alpha)}) AS BIGINT)
               AS kept
      FROM ranked
    )
    SELECT g AS {group}, day, CAST(max(n) AS BIGINT) AS n,
           round(avg(v), 6) AS mean,
           round(sum(CASE WHEN kept THEN v END)
                 / (max(n) - 2 * max(k)), 6) AS trimmed_mean,
           round((sum(CASE WHEN kept THEN v END)
                  + max(k) * min(CASE WHEN kept THEN v END)
                  + max(k) * max(CASE WHEN kept THEN v END))
                 / max(n), 6) AS winsorized_mean
    FROM flagged GROUP BY g, day ORDER BY g, day
    """


def exact_quantiles_by_interval(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_col: str,
    id_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact order-statistic quantiles per (group, day): the value at
    ``row_number == ceil(q·n)`` ordered by (value, id).

    No interpolation and no engine seam — ``percentile_cont`` variants
    disagree across engines on interpolation and tie handling, while the
    order-statistic definition is a pure integer-rank lookup, so this is
    value-checkable.  Same single-Exchange shape as
    :func:`trimmed_interval_stats`: the rank window and the final
    ``groupBy`` share the (group, day) partitioning.
    """
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    rows = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col), day, F.col(value_col).alias("v"), F.col(id_col)
    )
    wp = Window.partitionBy(group_col, "day")
    ranked = rows.withColumn(
        "rn", F.row_number().over(wp.orderBy("v", id_col))
    ).withColumn("n", F.count(F.lit(1)).over(wp))
    aggs = [F.max("n").cast("bigint").alias("n")]
    for q in qs:
        target = F.ceil(F.col("n") * F.lit(float(q)))
        label = f"p{int(round(q * 100))}"
        aggs.append(
            F.round(
                F.max(F.when(F.col("rn") == target, F.col("v"))), 6
            ).alias(label)
        )
    return ranked.groupBy(group_col, "day").agg(*aggs).orderBy(group_col, "day")


def exact_quantiles_oracle_sql(
    table: str,
    value: str,
    ts: str,
    group: str,
    id_: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    """DuckDB twin of :func:`exact_quantiles_by_interval`."""
    sels = []
    for q in qs:
        label = f"p{int(round(q * 100))}"
        sels.append(
            f"round(max(CASE WHEN rn = CAST(ceil(n * {float(q)}) AS BIGINT)"
            f" THEN v END), 6) AS {label}"
        )
    return f"""
    WITH rows_ AS (
      SELECT {group} AS g, date_trunc('day', {ts}) AS day,
             {value} AS v, {id_} AS id
      FROM {table} WHERE {value} IS NOT NULL
    ),
    ranked AS (
      SELECT g, day, v,
             row_number() OVER (PARTITION BY g, day ORDER BY v, id) AS rn,
             count(*) OVER (PARTITION BY g, day) AS n
      FROM rows_
    )
    SELECT g AS {group}, day, CAST(max(n) AS BIGINT) AS n,
           {", ".join(sels)}
    FROM ranked GROUP BY g, day ORDER BY g, day
    """


def mad_outliers_by_interval(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_col: str,
    z_thresh: float = 3.5,
    spike: float | None = None,
) -> DataFrame:
    """Per-group MAD robust z-scores over the daily-mean series.

    The robust twin of the reference's Z-score outlier criterion
    (reference evaluate.py:91-97): mean/std break down when the series
    already contains the outliers being hunted (masking), so production
    monitors use the Iglewicz-Hoaglin modified z-score
    ``0.6745 * (x - median) / MAD`` with the conventional 3.5 cutoff.
    The ``MAD == 0`` guard mirrors the reference's ``sigma == 0`` guard
    (evaluate.py:92-93): a flat series flags nothing.

    Exactness: both medians (of the series, then of the absolute
    deviations) are *integer-rank* order statistics — ``(x_lo + x_hi)/2``
    at ranks ``floor((n+1)/2)`` / ``ceil((n+1)/2)`` over a
    deterministic ``(value, day)`` order — never quantile
    interpolation, so DuckDB replays them exactly (the
    trimmed_interval_stats trick). Daily means are rounded to 6dp
    before the median pass so both engines proceed from identical
    doubles.

    Spark-first shape: ONE map-side-combined ``groupBy(group, day)``
    compacts the corpus to the #groups x #days series; every window
    after that runs over the compacted frame (tens of rows per group),
    partitioned by group — at 10^12 rows the heavy lifting is the one
    partial+final HashAggregate.

    ``spike`` (used by the oracle-checked query) plants a deterministic
    +spike shift on day-of-month 7 AFTER daily aggregation — identical
    literals in both engines — so the detector is verified on positive
    hits, not vacuous zeros.
    """
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    rows = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"), day, F.col(value_col).alias("v")
    )
    s = rows.groupBy("g", "day").agg(F.round(F.avg("v"), 6).alias("x"))
    if spike is not None:
        s = s.withColumn(
            "x",
            F.when(
                F.dayofmonth("day") == 7, F.col("x") + F.lit(float(spike))
            ).otherwise(F.col("x")),
        )
    wp = Window.partitionBy("g")
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.ceil((F.col("n") + 1) / 2)
    ranked = (
        s.withColumn("n", F.count(F.lit(1)).over(wp))
        .withColumn("rn", F.row_number().over(wp.orderBy("x", "day")))
    )
    med = (
        F.sum(
            F.when(
                (F.col("rn") == lo) | (F.col("rn") == hi), F.col("x")
            )
        ).over(wp)
        # when lo == hi (odd n) the one rank contributes once; divide by
        # the number of contributing ranks, written the same in SQL
        / F.sum(
            F.when(
                (F.col("rn") == lo) | (F.col("rn") == hi), F.lit(1)
            )
        ).over(wp)
    )
    devd = ranked.withColumn("med", med).withColumn(
        "dev", F.abs(F.col("x") - F.col("med"))
    )
    ranked2 = devd.withColumn(
        "rn2", F.row_number().over(wp.orderBy("dev", "day"))
    )
    mad = (
        F.sum(
            F.when(
                (F.col("rn2") == lo) | (F.col("rn2") == hi), F.col("dev")
            )
        ).over(wp)
        / F.sum(
            F.when(
                (F.col("rn2") == lo) | (F.col("rn2") == hi), F.lit(1)
            )
        ).over(wp)
    )
    scored = ranked2.withColumn("mad", mad).select(
        F.col("g").alias(group_col),
        "day",
        "x",
        F.when(F.col("mad") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(0.6745) * (F.col("x") - F.col("med")) / F.col("mad"),
                6,
            )
        )
        .alias("robust_z"),
    )
    return scored.withColumn(
        "is_outlier", F.abs(F.col("robust_z")) > F.lit(float(z_thresh))
    ).orderBy(group_col, "day")


def mad_outliers_oracle_sql(
    table: str,
    value: str,
    ts: str,
    group: str,
    z_thresh: float = 3.5,
    spike: float | None = None,
) -> str:
    """DuckDB twin of :func:`mad_outliers_by_interval`."""
    spike_expr = (
        f"CASE WHEN date_part('day', day) = 7 THEN x + {float(spike)} "
        "ELSE x END"
        if spike is not None
        else "x"
    )
    return f"""
    WITH s0 AS (
      SELECT {group} AS g, date_trunc('day', {ts}) AS day,
             round(avg({value}), 6) AS x
      FROM {table} WHERE {value} IS NOT NULL
      GROUP BY 1, 2
    ),
    s AS (SELECT g, day, {spike_expr} AS x FROM s0),
    r1 AS (
      SELECT g, day, x,
             count(*) OVER (PARTITION BY g) AS n,
             row_number() OVER (PARTITION BY g ORDER BY x, day) AS rn
      FROM s
    ),
    m1 AS (
      SELECT *,
             sum(CASE WHEN rn = CAST(floor((n+1)/2) AS BIGINT)
                        OR rn = CAST(ceil((n+1)/2) AS BIGINT)
                 THEN x END) OVER (PARTITION BY g)
             / sum(CASE WHEN rn = CAST(floor((n+1)/2) AS BIGINT)
                          OR rn = CAST(ceil((n+1)/2) AS BIGINT)
                   THEN 1 END) OVER (PARTITION BY g) AS med
      FROM r1
    ),
    r2 AS (
      SELECT *, abs(x - med) AS dev,
             row_number() OVER (PARTITION BY g ORDER BY abs(x - med), day)
               AS rn2
      FROM m1
    ),
    m2 AS (
      SELECT *,
             sum(CASE WHEN rn2 = CAST(floor((n+1)/2) AS BIGINT)
                        OR rn2 = CAST(ceil((n+1)/2) AS BIGINT)
                 THEN dev END) OVER (PARTITION BY g)
             / sum(CASE WHEN rn2 = CAST(floor((n+1)/2) AS BIGINT)
                          OR rn2 = CAST(ceil((n+1)/2) AS BIGINT)
                   THEN 1 END) OVER (PARTITION BY g) AS mad
      FROM r2
    )
    SELECT g AS {group}, day, x,
           CASE WHEN mad = 0 THEN 0.0
                ELSE round(0.6745 * (x - med) / mad, 6) END AS robust_z,
           CASE WHEN mad = 0 THEN FALSE
                ELSE abs(round(0.6745 * (x - med) / mad, 6))
                     > {float(z_thresh)} END AS is_outlier
    FROM m2 ORDER BY {group}, day
    """
