"""Event-stream analytics: cohort retention, funnel conversion, EWMA
forecast deviation.

The reference evaluator aggregates per-interval stats over an event
table (reference aggregate.py:23-60, evaluate.py:33-97); production
monitoring of the same table needs the three classic event-flow views
this module adds — weekly cohort retention, ordered-step funnel
conversion, and an EWMA forecast-deviation control chart. All three are
pure-Catalyst (no Python UDFs) and compact the corpus FIRST:

- retention: two user-level HashAggregates (uniform key — user_id), then
  a join on the #cohorts-sized frame;
- funnel: one ``groupBy(user, day)`` with a sorted-array fold — a single
  shuffle where the naive min-ts-chain formulation needs three;
- EWMA: the (group, day) compaction aggregate, then a bounded-range
  self-join over the tens-of-rows-per-group series.

At 10^12 rows the heavy lifting in each is the first map-side-combined
aggregate; everything after runs on model-sized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cohort_retention",
    "cohort_retention_oracle_sql",
    "funnel_conversion",
    "funnel_conversion_oracle_sql",
    "ewma_deviation",
    "ewma_deviation_oracle_sql",
    "rolling_active_users",
    "rolling_active_users_oracle_sql",
]


def cohort_retention(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly cohort retention matrix.

    Each user joins the cohort of their first-activity ISO week
    (``date_trunc('week')`` — Monday in both Spark and DuckDB); for
    every later week in which the cohort is active the row reports the
    active-user count and the retained fraction of the cohort.

    Shape: one ``groupBy(user)`` min (uniform key, map-side combined),
    one ``(user, week)`` distinct, then the counting aggregates run on
    the #users- and #(cohort, week)-sized frames. The cohort-size join
    is broadcast-able (#cohorts rows).
    """
    u = F.col(user_col).alias("u")
    week = F.date_trunc("week", F.col(ts_col)).alias("week")
    activity = df.select(u, week).distinct()
    first = activity.groupBy("u").agg(F.min("week").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.countDistinct("u").alias("cohort_size")
    )
    joined = activity.join(first, "u")
    counts = joined.groupBy("cohort_week", "week").agg(
        F.countDistinct("u").alias("n_active")
    )
    return (
        counts.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            (
                (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
                .cast("int")
                .alias("week_offset")
            ),
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


def cohort_retention_oracle_sql(table: str, user: str, ts: str) -> str:
    """DuckDB twin of :func:`cohort_retention`."""
    return f"""
    WITH activity AS (
      SELECT DISTINCT {user} AS u, date_trunc('week', {ts}) AS week
      FROM {table}
    ),
    first AS (
      SELECT u, min(week) AS cohort_week FROM activity GROUP BY u
    ),
    sizes AS (
      SELECT cohort_week, count(DISTINCT u) AS cohort_size
      FROM first GROUP BY cohort_week
    ),
    counts AS (
      SELECT f.cohort_week, a.week, count(DISTINCT a.u) AS n_active
      FROM activity a JOIN first f ON a.u = f.u
      GROUP BY 1, 2
    )
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, c.week) / 7 AS INT)
             AS week_offset,
           c.n_active, s.cohort_size,
           round(c.n_active / CAST(s.cohort_size AS DOUBLE), 6)
             AS retention
    FROM counts c JOIN sizes s ON c.cohort_week = s.cohort_week
    ORDER BY c.cohort_week, week_offset
    """


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Per-day ordered-step funnel: how many users completed step 1,
    steps 1→2, … within a day, with strictly increasing timestamps.

    Spark-first shape: ONE ``groupBy(user, day)`` collects the user's
    day as a sorted ``(ts, type)`` array, and a Catalyst ``aggregate``
    fold walks the funnel (advance on the next step's first event with
    ``ts >`` the previous advance) — a single shuffle where the min-ts
    chain needs one aggregate + join PER STEP. Greedy earliest-match is
    optimal for funnel feasibility, so the fold matches the min-chain
    oracle exactly; groups are bounded by a user's events in one day.
    """
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    evs = df.where(F.col(type_col).isin(*steps)).select(
        F.col(user_col).alias("u"),
        day,
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("typ"),
    )
    seqs = evs.groupBy("u", "day").agg(
        F.sort_array(F.collect_list(F.struct("ts", "typ"))).alias("seq")
    )

    def _step(acc, e):
        advance = None
        for i, s in enumerate(steps):
            cond = (acc["stage"] == i) & (e["typ"] == F.lit(s))
            if i > 0:
                cond = cond & (e["ts"] > acc["at"])
            advance = cond if advance is None else (advance | cond)
        return F.when(
            advance,
            F.struct(
                (acc["stage"] + 1).alias("stage"), e["ts"].alias("at")
            ),
        ).otherwise(acc)

    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp").alias("at"),
    )
    depth = seqs.select(
        "u",
        "day",
        F.aggregate("seq", init, _step)["stage"].alias("depth"),
    )
    aggs = [
        F.sum((F.col("depth") >= i + 1).cast("int")).alias(f"n_step{i + 1}")
        for i in range(len(steps))
    ]
    out = depth.groupBy("day").agg(*aggs)
    rates = [
        F.round(
            F.when(
                F.col(f"n_step{i}") > 0,
                F.col(f"n_step{i + 1}") / F.col(f"n_step{i}"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias(f"rate_{i}_to_{i + 1}")
        for i in range(1, len(steps))
    ]
    return out.select("day", *[f"n_step{i+1}" for i in range(len(steps))],
                      *rates).orderBy("day")


def funnel_conversion_oracle_sql(
    table: str,
    user: str,
    ts: str,
    typ: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> str:
    """DuckDB twin of :func:`funnel_conversion` via the min-ts chain."""
    in_list = ", ".join(f"'{s}'" for s in steps)
    ctes = [
        f"""e AS (
      SELECT {user} AS u, date_trunc('day', {ts}) AS day,
             {ts} AS ts, {typ} AS typ
      FROM {table} WHERE {typ} IN ({in_list})
    )""",
        f"""s1 AS (
      SELECT u, day, min(ts) AS m1 FROM e
      WHERE typ = '{steps[0]}' GROUP BY u, day
    )""",
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"""s{i + 1} AS (
      SELECT e.u, e.day, min(e.ts) AS m{i + 1}
      FROM e JOIN s{i} ON e.u = s{i}.u AND e.day = s{i}.day
      WHERE e.typ = '{steps[i]}' AND e.ts > s{i}.m{i}
      GROUP BY e.u, e.day
    )"""
        )
    counts = [
        f"""c{i + 1} AS (
      SELECT day, count(*) AS n_step{i + 1} FROM s{i + 1} GROUP BY day
    )"""
        for i in range(len(steps))
    ]
    # every day with any step-typed event appears in the Spark output
    # (with zero counts when nobody completed step 1) — anchor the day
    # list on e, not on c1
    counts.append("days AS (SELECT DISTINCT day FROM e)")
    joins = "".join(
        f" LEFT JOIN c{i + 1} USING (day)" for i in range(len(steps))
    )
    n_cols = ", ".join(
        f"coalesce(n_step{i + 1}, 0) AS n_step{i + 1}"
        for i in range(len(steps))
    )
    rate_cols = ", ".join(
        f"""round(CASE WHEN coalesce(n_step{i}, 0) > 0
                 THEN coalesce(n_step{i + 1}, 0)
                      / CAST(n_step{i} AS DOUBLE)
                 ELSE 0.0 END, 6) AS rate_{i}_to_{i + 1}"""
        for i in range(1, len(steps))
    )
    return f"""
    WITH {", ".join(ctes)}, {", ".join(counts)}
    SELECT day, {n_cols}, {rate_cols}
    FROM days{joins} ORDER BY day
    """


# EWMA decay 0.5: every weight is a power of two, so the per-term
# products are EXACT in binary floating point — the only engine seam
# left is double-sum ordering, the same seam every mean/stddev oracle
# in this repo already tolerates at 6dp rounding.
_EWMA_Q = 0.5
_EWMA_WINDOW = 30


def ewma_deviation(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_col: str,
    spike: float | None = None,
    flag_abs: float = 30.0,
) -> DataFrame:
    """EWMA forecast-deviation control chart over the daily-mean series.

    For each group's day t the forecast is the decay-0.5 weighted mean
    of the previous ``_EWMA_WINDOW`` daily means (strictly preceding —
    a true one-step-ahead forecast, so a spike day cannot mask itself);
    ``deviation = x_t - forecast`` and days with
    ``|deviation| > flag_abs`` are flagged. The sequential twin of the
    MAD chart in :mod:`.robust` — MAD catches level outliers, EWMA
    catches breaks from the local trend.

    Exactness: daily means round to 6dp first, weights are powers of
    two (exact products), and the first day per group has a NULL
    forecast and is never flagged — identical in the DuckDB twin.

    Shape: the corpus-compacting ``groupBy(group, day)`` aggregate,
    then a bounded-range self-join on the compacted series (≤ window
    rows matched per day, partitioned by group).

    ``spike`` plants a +spike shift on day-of-month 7 after daily
    aggregation (both engines, identical literals) so the detector is
    value-checked on positive hits.
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
    s = s.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("day"))
    )
    t, i = s.alias("t"), s.alias("i")
    d = F.col("t.rn") - F.col("i.rn")
    w = F.pow(F.lit(_EWMA_Q), d - 1)
    fc = (
        t.join(
            i,
            (F.col("t.g") == F.col("i.g"))
            & (F.col("i.rn") < F.col("t.rn"))
            & (F.col("i.rn") >= F.col("t.rn") - F.lit(_EWMA_WINDOW)),
            "left",
        )
        .groupBy(F.col("t.g").alias("g"), F.col("t.day").alias("day"),
                 F.col("t.x").alias("x"))
        .agg(
            F.round(
                F.sum(F.col("i.x") * w) / F.sum(w), 6
            ).alias("forecast")
        )
    )
    return (
        fc.select(
            F.col("g").alias(group_col),
            "day",
            "x",
            "forecast",
            F.round(F.col("x") - F.col("forecast"), 6).alias("deviation"),
            F.coalesce(
                F.abs(F.round(F.col("x") - F.col("forecast"), 6))
                > F.lit(float(flag_abs)),
                F.lit(False),
            ).alias("is_break"),
        )
        .orderBy(group_col, "day")
    )


def ewma_deviation_oracle_sql(
    table: str,
    value: str,
    ts: str,
    group: str,
    spike: float | None = None,
    flag_abs: float = 30.0,
) -> str:
    """DuckDB twin of :func:`ewma_deviation`."""
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
    s1 AS (SELECT g, day, {spike_expr} AS x FROM s0),
    s AS (
      SELECT *, row_number() OVER (PARTITION BY g ORDER BY day) AS rn
      FROM s1
    ),
    fc AS (
      SELECT t.g, t.day, t.x,
             round(
               sum(i.x * power({_EWMA_Q}, t.rn - i.rn - 1))
               / sum(power({_EWMA_Q}, t.rn - i.rn - 1)), 6) AS forecast
      FROM s t LEFT JOIN s i
        ON t.g = i.g AND i.rn < t.rn AND i.rn >= t.rn - {_EWMA_WINDOW}
      GROUP BY t.g, t.day, t.x
    )
    SELECT g AS {group}, day, x, forecast,
           round(x - forecast, 6) AS deviation,
           coalesce(abs(round(x - forecast, 6)) > {float(flag_abs)}, FALSE)
             AS is_break
    FROM fc ORDER BY {group}, day
    """


def rolling_active_users(
    df: DataFrame, user_col: str, ts_col: str, window_days: int = 7
) -> DataFrame:
    """Per-day DAU, new-user DAU, and trailing-``window_days`` active
    users (WAU), exact.

    Scale shape: the corpus compacts to the distinct ``(user, day)``
    activity frame first (one uniform-keyed aggregate). The trailing
    window is then a map-side ``explode(sequence(day, day+W-1))`` over
    the activity frame — each activity row contributes to the W days it
    keeps the user "active" — followed by ONE countDistinct aggregate.
    That is the 100-TB-right alternative to a day-range theta-join,
    which Spark would execute as a BroadcastNestedLoopJoin costing
    ``|activity| × |days|`` comparisons; the explode costs exactly
    ``W × |activity|`` rows shuffled and stays an equijoin/aggregate
    plan. Phantom target days past the last observed day are dropped by
    an inner join against the observed-day frame (broadcast,
    #days rows).
    """
    u = F.col(user_col).alias("u")
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    activity = df.select(u, day).distinct()
    first = activity.groupBy("u").agg(F.min("day").alias("fday"))
    dau = (
        activity.join(first, "u")
        .groupBy("day")
        .agg(
            F.countDistinct("u").alias("dau"),
            F.countDistinct(
                F.when(F.col("fday") == F.col("day"), F.col("u"))
            ).alias("dau_new"),
        )
    )
    days = activity.select("day").distinct()
    expanded = activity.select(
        "u",
        F.explode(
            F.expr(
                f"sequence(day, day + interval {window_days - 1} day,"
                " interval 1 day)"
            )
        ).alias("day"),
    )
    wau = (
        expanded.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("u").alias(f"wau_{window_days}"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "dau_new",
            f"wau_{window_days}",
            F.round(F.col("dau_new") / F.col("dau"), 6).alias("new_rate"),
        )
        .orderBy("day")
    )


def rolling_active_users_oracle_sql(
    table: str, user: str, ts: str, window_days: int = 7
) -> str:
    """DuckDB twin of :func:`rolling_active_users`."""
    w = window_days
    return f"""
    WITH activity AS (
      SELECT DISTINCT {user} AS u, date_trunc('day', {ts}) AS day
      FROM {table}
    ),
    first AS (SELECT u, min(day) AS fday FROM activity GROUP BY u),
    days AS (SELECT DISTINCT day FROM activity),
    dau AS (
      SELECT a.day, count(DISTINCT a.u) AS dau,
             count(DISTINCT CASE WHEN f.fday = a.day THEN a.u END)
               AS dau_new
      FROM activity a JOIN first f ON a.u = f.u
      GROUP BY a.day
    ),
    exp AS (
      SELECT u,
             unnest(generate_series(day, day + INTERVAL {w - 1} DAY,
                                    INTERVAL 1 DAY)) AS tday
      FROM activity
    ),
    wau AS (
      SELECT e.tday AS day, count(DISTINCT e.u) AS wau_{w}
      FROM exp e JOIN days d ON e.tday = d.day
      GROUP BY 1
    )
    SELECT day, dau, dau_new, wau_{w},
           round(dau_new / CAST(dau AS DOUBLE), 6) AS new_rate
    FROM dau JOIN wau USING (day) ORDER BY day
    """
