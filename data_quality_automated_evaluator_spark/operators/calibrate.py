"""Data-driven threshold calibration for quality rules.

Fixed thresholds (Thresholds.max_chars etc.) mis-fire when sources
differ wildly (code vs chat vs web); the standard remedy calibrates
per-stratum percentile bounds from the data itself and flags rows
outside them.

Plan shape: one aggregation pass computes the per-stratum quantiles
(#strata rows — tiny), which then BROADCAST-join back onto the corpus;
the flagging filter is a codegen'd comparison. Total cost: one scan +
one small agg + a map-side join — no corpus shuffle. With
``approx=True`` the quantiles come from percentile_approx (bounded
memory — the 10^12-row path); exact interpolated percentiles otherwise
(oracle parity with DuckDB quantile_cont).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["calibrated_bounds", "with_calibrated_flags"]


def calibrated_bounds(
    df: DataFrame,
    value_col: str,
    strata_col: str = "source",
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    approx: bool = False,
) -> DataFrame:
    """(strata, lo, hi) — per-stratum [lo_q, hi_q] percentile bounds."""
    if approx:
        lo = F.expr(f"percentile_approx({value_col}, {lo_q}, 10000)")
        hi = F.expr(f"percentile_approx({value_col}, {hi_q}, 10000)")
    else:
        lo = F.expr(f"percentile({value_col}, {lo_q})")
        hi = F.expr(f"percentile({value_col}, {hi_q})")
    return df.groupBy(strata_col).agg(
        lo.cast("double").alias("lo"), hi.cast("double").alias("hi")
    )


def with_calibrated_flags(
    df: DataFrame,
    value_col: str,
    strata_col: str = "source",
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    flag_col: str = "len_outlier",
    approx: bool = False,
) -> DataFrame:
    """Input plus ``lo``/``hi`` bound columns and a boolean ``flag_col``
    marking rows outside their stratum's calibrated band. EVERY input
    row survives: the bounds join is a left join (an inner join would
    silently drop NULL-stratum rows — SQL NULL keys never compare
    equal), and rows whose stratum or value can't be judged get
    ``flag_col = false`` with NULL bounds."""
    bounds = calibrated_bounds(df, value_col, strata_col, lo_q, hi_q, approx)
    flagged = (
        df.join(F.broadcast(bounds), strata_col, "left")
        .withColumn(
            flag_col,
            F.coalesce(
                (F.col(value_col) < F.col("lo"))
                | (F.col(value_col) > F.col("hi")),
                F.lit(False),
            ),
        )
    )
    return flagged
