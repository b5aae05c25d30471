"""Metric drift detection over interval statistics (rolling z-score).

The reference evaluates quality stats per time interval (reference
evaluate.py; this repo's interval_stats queries).  In production those
per-interval metrics are themselves monitored: a sudden shift in a
daily mean signals an upstream pipeline break (schema change, source
outage, filter regression).  The standard detector is a rolling
z-score: compare each interval's value against the mean/std of the
previous ``window`` intervals.

Spark-first shape: the metric table is already tiny relative to the
corpus (one row per group × interval), so this is ONE ordered window
per group — ``avg``/``stddev``/``count`` over a trailing ROWS frame
that EXCLUDES the current row (no self-influence), then a flag
comparison, all in whole-stage codegen.  At 10^12 source rows the
detector's input is still only the aggregated metric series; the single
narrow shuffle keys on the group column.

Deterministic (frame ordered by the unique interval timestamp) and
fully SQL-expressible, so the driver value-checks it end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_drift_flags"]


def rolling_drift_flags(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_cols: list[str] | None = None,
    window: int = 7,
    z: float = 3.0,
    min_periods: int = 3,
) -> DataFrame:
    """Append rolling-baseline columns and a drift flag.

    For each row: ``base_mean``/``base_std`` (sample std) over the
    previous ``window`` rows of its group ordered by ``ts_col`` —
    current row excluded — and ``drift = |value - mean| > z * std``.
    Rows with fewer than ``min_periods`` prior points, a NULL value, or
    zero/NULL baseline std never flag (warm-up and constant baselines
    are not evidence of drift).
    """
    if window < 1 or min_periods < 2:
        raise ValueError("require window >= 1 and min_periods >= 2")
    groups = group_cols or []
    w = (
        Window.partitionBy(*groups)
        .orderBy(ts_col)
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col)
    m = F.avg(v).over(w)
    s = F.stddev(v).over(w)
    n = F.count(v).over(w)
    drift = (
        (n >= min_periods)
        & v.isNotNull()
        & s.isNotNull()
        & (s > 0)
        & (F.abs(v - m) > z * s)
    )
    return (
        df.withColumn("base_mean", F.round(m, 6))
        .withColumn("base_std", F.round(s, 6))
        .withColumn("n_baseline", n)
        .withColumn("drift", F.coalesce(drift, F.lit(False)))
    )
