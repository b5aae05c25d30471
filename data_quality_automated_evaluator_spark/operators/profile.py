"""Whole-table column profiling in a single aggregation pass.

The reference is a data-quality evaluator: its per-column stats
(aggregates.py via functions/aggregates.py here) run over CONFIGURED
columns.  Production data-quality tooling also needs the generic form —
profile EVERY column of an arbitrary table (null counts, cardinality,
ranges) to catch schema drift and ingestion breaks before any rule is
configured.

Spark-first shape: all metrics for all columns evaluate in ONE
``agg(...)`` — a single scan, partial→final HashAggregate, no per-column
pass.  The wide single-row result is unpivoted to long format
``(column, metric, value)`` with ``stack`` (map-only on one row).  The
exact multi-column ``countDistinct`` plans the canonical Expand
(rows × distinct-columns); pass ``approx=True`` to swap in
``approx_count_distinct`` HLL sketches and drop the Expand — the same
exact/approx pair of plans as the interval stats queries
(entry_queries.interval_stats_events_1d/_approx).

Numeric and timestamp ranges are reported as doubles (timestamps as
epoch seconds), which keeps the output schema uniform and the values
engine-portable — string-formatting floats is where cross-engine parity
dies.  Complex-typed columns (map/array/struct) get null/count metrics
only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_table"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Long-format profile ``(column, metric, value)`` of ``columns``
    (default: all).  Metrics per column: ``n_nonnull``, ``n_null``, and
    for atomic types ``n_distinct`` (exact, or HLL when ``approx``);
    numeric columns add ``min``/``max``/``mean``, timestamps add
    ``min``/``max`` as epoch seconds.  All doubles rounded to 6dp.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else list(fields)
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")

    aggs: list[Column] = []
    metrics: list[tuple[str, str]] = []  # (column, metric) per agg slot

    def add(col: str, metric: str, expr: Column) -> None:
        aggs.append(expr.alias(f"_{len(aggs)}"))
        metrics.append((col, metric))

    for c in cols:
        dt = fields[c]
        x = F.col(c)
        add(c, "n_nonnull", F.count(x).cast("double"))
        add(c, "n_null", F.sum(x.isNull().cast("long")).cast("double"))
        atomic = isinstance(dt, (T.StringType, T.BooleanType, T.DateType,
                                 T.TimestampType, T.TimestampNTZType) + _NUMERIC)
        if atomic:
            dc = (
                F.approx_count_distinct(x) if approx else F.countDistinct(x)
            )
            add(c, "n_distinct", dc.cast("double"))
        if isinstance(dt, _NUMERIC):
            add(c, "min", F.round(F.min(x).cast("double"), 6))
            add(c, "max", F.round(F.max(x).cast("double"), 6))
            add(c, "mean", F.round(F.avg(x), 6))
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            # NTZ has no direct double cast; route through TIMESTAMP
            # (session tz is UTC repo-wide) -> epoch seconds
            add(c, "min", F.min(x).cast("timestamp").cast("double"))
            add(c, "max", F.max(x).cast("timestamp").cast("double"))

    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', '{metric}', _{i}" for i, (col, metric) in enumerate(metrics)
    )
    return wide.select(
        F.expr(
            f"stack({len(metrics)}, {stack_args}) AS (column, metric, value)"
        )
    )


def freshness_audit(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    stale_hours: float = 24.0,
) -> DataFrame:
    """Per-group data-freshness audit: how far each group's newest row
    lags the table's newest row, and whether the group is stale.

    The ingestion-break detector a 100 TB pipeline runs before anything
    else: a source whose ``max(ts)`` trails the global watermark by more
    than ``stale_hours`` stopped arriving.  Two tiny aggregates — the
    per-group one shuffles only (group, max_ts, counts); the 1-row
    global watermark broadcasts back — and lag is computed with the
    session-tz-free interval cast (no epoch round-trip), in exact
    seconds.
    """
    per_group = df.groupBy(group_col).agg(
        F.max(ts_col).alias("max_ts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    watermark = df.agg(F.max(ts_col).alias("__wm"))
    # Truncate both endpoints to whole seconds first: Spark's interval
    # cast truncates the *duration* while DuckDB's date_diff counts
    # *boundary crossings* — on whole-second timestamps the two agree
    # exactly (and second resolution is ample for a freshness audit).
    lag_sec = (
        (
            F.date_trunc("second", F.col("__wm"))
            - F.date_trunc("second", F.col("max_ts"))
        )
        .cast("interval day to second")
        .cast("long")
    )
    return (
        per_group.crossJoin(F.broadcast(watermark))
        .select(
            group_col,
            "max_ts",
            "n_rows",
            F.round(lag_sec / 3600.0, 6).alias("lag_hours"),
            (lag_sec > F.lit(int(stale_hours * 3600))).alias("stale"),
        )
        .orderBy(group_col)
    )


def freshness_oracle_sql(
    table: str, ts: str, group: str, stale_hours: float = 24.0
) -> str:
    """DuckDB twin of :func:`freshness_audit` (date_diff seconds)."""
    return f"""
    WITH per_group AS (
      SELECT {group} AS g, max({ts}) AS max_ts, count(*) AS n_rows
      FROM {table} GROUP BY 1
    ),
    wm AS (SELECT max({ts}) AS w FROM {table})
    SELECT g AS {group}, max_ts, CAST(n_rows AS BIGINT) AS n_rows,
           round(date_diff('second', date_trunc('second', max_ts),
                           date_trunc('second', w)) / 3600.0, 6)
             AS lag_hours,
           date_diff('second', date_trunc('second', max_ts),
                     date_trunc('second', w)) > {int(stale_hours * 3600)}
             AS stale
    FROM per_group, wm ORDER BY g
    """
