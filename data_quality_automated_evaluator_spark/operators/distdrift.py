"""Distribution drift between two time slices: PSI and two-sample KS.

The reference evaluator monitors per-interval aggregate stats (reference
evaluate.py); production data-quality systems additionally compare the
*shape* of a metric's distribution between a baseline window and the
current window.  The two canonical detectors:

* **PSI** (Population Stability Index) — bucket both slices into shared
  equal-width bins and sum ``(p_cur - p_base) * ln(p_cur / p_base)``.
  PSI > 0.2 is the conventional "significant shift" alarm.
* **KS** (two-sample Kolmogorov-Smirnov) — the max vertical gap between
  the two empirical CDFs, compared against the α=0.05 critical value
  ``1.358 * sqrt((n_a + n_b) / (n_a * n_b))``.

Spark-first shape (holds at 10^12 rows):

* Both detectors reduce the corpus with ONE map-side-combined
  ``groupBy`` on a compact key (``(group, bin)`` for PSI,
  ``(group, value)`` for KS) before any window — the windows then run
  over the *compacted* frame (10 bins per group; distinct metric values
  per group), never over raw rows.
* Bin edges come from a tiny per-group min/max aggregate that is
  broadcast back to the fact table — no second scan, no driver collect.
* All proportions divide exact BIGINT counts, so the only
  floating-point steps are the final divisions / ``ln`` — and the PSI
  sum is quantized to integer nano-units per bin before summing, making
  the one-row-per-group result shuffle-order-proof (same trick as
  functions/textstats.zipf_slope_stats).

The time split is deterministic and engine-portable: *baseline* is
day-of-month ≤ 15, *current* is the rest — no session-timezone epoch
arithmetic (the trap documented in entry_queries.conv_features).

Mirrors the reference's interval-stats monitoring mission
(reference evaluate.py, README.md quality-stats tables) as a
distribution-level extension; fully SQL-expressible so the driver
value-checks both detectors end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["psi_drift", "ks_drift"]

#: PSI alarm threshold (industry convention: <0.1 stable, >0.2 shifted).
PSI_ALARM = 0.2

#: KS α=0.05 two-sample coefficient: c(α) = sqrt(-ln(α/2)/2) ≈ 1.358.
KS_COEFF = 1.358

#: Integer quantization scale for the order-proof PSI sum.
_NANO = 1_000_000_000


def _with_split(df: DataFrame, ts_col: str) -> DataFrame:
    """Tag each row baseline/current: day-of-month ≤ 15 is baseline."""
    return df.withColumn(
        "__is_base", (F.dayofmonth(F.col(ts_col)) <= F.lit(15)).cast("int")
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_col: str,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index of ``value_col`` per ``group_col``
    between the month's first half (baseline) and second half (current).

    Returns one row per group: ``(group, n_base, n_cur, psi, drift)``.
    Bin edges are equal-width over the group's global [min, max] so both
    slices share the same buckets; proportions are Laplace-smoothed with
    α=0.5 so empty buckets never produce ``ln(0)``.
    """
    rows = _with_split(
        df.where(F.col(value_col).isNotNull()), ts_col
    ).select(group_col, value_col, "__is_base")

    # Tiny per-group edge frame, broadcast back to the fact rows.
    edges = rows.groupBy(group_col).agg(
        F.min(value_col).alias("__vmin"), F.max(value_col).alias("__vmax")
    )
    binned = rows.join(F.broadcast(edges), group_col).withColumn(
        "__bin",
        F.when(F.col("__vmax") == F.col("__vmin"), F.lit(0)).otherwise(
            F.least(
                F.floor(
                    (F.col(value_col) - F.col("__vmin"))
                    * F.lit(float(bins))
                    / (F.col("__vmax") - F.col("__vmin"))
                ).cast("int"),
                F.lit(bins - 1),
            )
        ),
    )

    # ONE wide shuffle: map-side-combined counts per (group, bin).
    per_bin = binned.groupBy(group_col, "__bin").agg(
        F.sum("__is_base").alias("__cb"),
        F.sum(F.lit(1) - F.col("__is_base")).alias("__cc"),
    )

    wg = Window.partitionBy(group_col)
    k = F.lit(float(bins))  # smoothing denominator: n + bins * 0.5
    term = (
        (F.col("__pc") - F.col("__pb"))
        * F.log(F.col("__pc") / F.col("__pb"))
    )
    scored = (
        per_bin.withColumn("__nb", F.sum("__cb").over(wg))
        .withColumn("__nc", F.sum("__cc").over(wg))
        .withColumn(
            "__pb", (F.col("__cb") + F.lit(0.5)) / (F.col("__nb") + k * 0.5)
        )
        .withColumn(
            "__pc", (F.col("__cc") + F.lit(0.5)) / (F.col("__nc") + k * 0.5)
        )
        # Nano-quantized per-bin term: the cross-partition sum is then
        # exact integer arithmetic — immune to float summation order.
        .withColumn(
            "__q", F.round(term * F.lit(float(_NANO))).cast("bigint")
        )
    )
    return (
        scored.groupBy(group_col)
        .agg(
            F.max("__nb").cast("bigint").alias("n_base"),
            F.max("__nc").cast("bigint").alias("n_cur"),
            F.round(F.sum("__q") / F.lit(float(_NANO)), 6).alias("psi"),
            (
                F.sum("__q") / F.lit(float(_NANO)) > F.lit(PSI_ALARM)
            ).alias("drift"),
        )
        .orderBy(group_col)
    )


def psi_oracle_sql(table: str, value: str, ts: str, group: str,
                   bins: int = 10) -> str:
    """DuckDB twin of :func:`psi_drift` (identical arithmetic order)."""
    return f"""
    WITH rows_ AS (
      SELECT {group} AS g, {value} AS v,
             CASE WHEN day({ts}) <= 15 THEN 1 ELSE 0 END AS is_base
      FROM {table} WHERE {value} IS NOT NULL
    ),
    edges AS (SELECT g, min(v) AS vmin, max(v) AS vmax FROM rows_ GROUP BY g),
    binned AS (
      SELECT r.g, r.is_base,
             CASE WHEN e.vmax = e.vmin THEN 0
                  ELSE least(CAST(floor((r.v - e.vmin) * {float(bins)}
                                        / (e.vmax - e.vmin)) AS INTEGER),
                             {bins - 1}) END AS bin
      FROM rows_ r JOIN edges e USING (g)
    ),
    per_bin AS (
      SELECT g, bin, sum(is_base) AS cb, sum(1 - is_base) AS cc
      FROM binned GROUP BY g, bin
    ),
    scored AS (
      SELECT g, cb, cc,
             sum(cb) OVER (PARTITION BY g) AS nb,
             sum(cc) OVER (PARTITION BY g) AS nc
      FROM per_bin
    ),
    quant AS (
      SELECT g, nb, nc,
             CAST(round(((cc + 0.5) / (nc + {float(bins)} * 0.5)
                         - (cb + 0.5) / (nb + {float(bins)} * 0.5))
                        * ln(((cc + 0.5) / (nc + {float(bins)} * 0.5))
                             / ((cb + 0.5) / (nb + {float(bins)} * 0.5)))
                        * {float(_NANO)}) AS BIGINT) AS q
      FROM scored
    )
    SELECT g AS {group}, CAST(max(nb) AS BIGINT) AS n_base,
           CAST(max(nc) AS BIGINT) AS n_cur,
           round(sum(q) / {float(_NANO)}, 6) AS psi,
           sum(q) / {float(_NANO)} > {PSI_ALARM} AS drift
    FROM quant GROUP BY g ORDER BY g
    """


def ks_drift(
    df: DataFrame, value_col: str, ts_col: str, group_col: str
) -> DataFrame:
    """Two-sample KS statistic of ``value_col`` per ``group_col`` between
    the month-half slices of :func:`psi_drift`.

    Returns ``(group, n_base, n_cur, ks, ks_crit, drift)`` — ``ks`` is
    ``max |ECDF_base - ECDF_cur|`` over the distinct observed values;
    ``drift`` compares against the α=0.05 critical value.  Cumulative
    counts are exact BIGINTs; the divisions and ``max`` are
    order-independent, so the result is engine- and shuffle-stable.
    """
    rows = _with_split(
        df.where(F.col(value_col).isNotNull()), ts_col
    ).select(group_col, value_col, "__is_base")

    # Compact first: one map-side-combined shuffle to per-value counts.
    per_val = rows.groupBy(group_col, value_col).agg(
        F.sum("__is_base").alias("__cb"),
        F.sum(F.lit(1) - F.col("__is_base")).alias("__cc"),
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(group_col)
    cdf = (
        per_val.withColumn("__ab", F.sum("__cb").over(wcum))
        .withColumn("__ac", F.sum("__cc").over(wcum))
        .withColumn("__nb", F.sum("__cb").over(wg))
        .withColumn("__nc", F.sum("__cc").over(wg))
        .withColumn(
            "__gap",
            F.abs(
                F.col("__ab") / F.col("__nb") - F.col("__ac") / F.col("__nc")
            ),
        )
    )
    ks = F.max("__gap")
    # (n_a + n_b) / (n_a * n_b) written as 1/n_a + 1/n_b: the product of
    # two 10^12-scale BIGINT counts would overflow; this form never does
    # (and the oracle uses the identical expression for bit-parity).
    crit = F.lit(KS_COEFF) * F.sqrt(
        F.lit(1.0) / F.max("__nb") + F.lit(1.0) / F.max("__nc")
    )
    return (
        cdf.groupBy(group_col)
        .agg(
            F.max("__nb").cast("bigint").alias("n_base"),
            F.max("__nc").cast("bigint").alias("n_cur"),
            F.round(ks, 6).alias("ks"),
            F.round(crit, 6).alias("ks_crit"),
            (ks > crit).alias("drift"),
        )
        .orderBy(group_col)
    )


def ks_oracle_sql(table: str, value: str, ts: str, group: str) -> str:
    """DuckDB twin of :func:`ks_drift` (identical arithmetic order)."""
    return f"""
    WITH rows_ AS (
      SELECT {group} AS g, {value} AS v,
             CASE WHEN day({ts}) <= 15 THEN 1 ELSE 0 END AS is_base
      FROM {table} WHERE {value} IS NOT NULL
    ),
    per_val AS (
      SELECT g, v, sum(is_base) AS cb, sum(1 - is_base) AS cc
      FROM rows_ GROUP BY g, v
    ),
    cdf AS (
      SELECT g,
             sum(cb) OVER (PARTITION BY g ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS ab,
             sum(cc) OVER (PARTITION BY g ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS ac,
             sum(cb) OVER (PARTITION BY g) AS nb,
             sum(cc) OVER (PARTITION BY g) AS nc
      FROM per_val
    )
    SELECT g AS {group}, CAST(max(nb) AS BIGINT) AS n_base,
           CAST(max(nc) AS BIGINT) AS n_cur,
           round(max(abs(ab / nb - ac / nc)), 6) AS ks,
           round({KS_COEFF} * sqrt(1.0 / max(nb) + 1.0 / max(nc)), 6)
             AS ks_crit,
           max(abs(ab / nb - ac / nc))
             > {KS_COEFF} * sqrt(1.0 / max(nb) + 1.0 / max(nc)) AS drift
    FROM cdf GROUP BY g ORDER BY g
    """


# ---------------------------------------------------------------------------
# Content drift: per-slice unigram KL divergence vs the whole corpus
# ---------------------------------------------------------------------------

def unigram_kl(
    docs: DataFrame,
    slice_col: str = "source",
    text_col: str = "text",
    vocab_size: int = 2000,
) -> DataFrame:
    """KL(P_slice || P_corpus) over the word-unigram distribution,
    restricted to the corpus-wide top-``vocab_size`` vocabulary — the
    content-level twin of :func:`psi_drift` (which drifts numeric
    values): "which source's token mix diverges most from the corpus?"
    is the standard mixing/contamination triage question for a
    training-data pipeline.

    Scale shape: ONE exploded token pass feeds a ``(slice, term)``
    map-side-combined count; the vocabulary is a bounded
    TakeOrderedAndProject top-k (counts desc, term asc — deterministic)
    that is BROADCAST back, so no vocabulary-wide shuffle or window
    ever runs.  The #slices × ``vocab_size`` smoothing grid (Laplace
    α=1 over the restricted vocabulary) is metadata-sized.  Per-term
    contributions ``p·ln(p/q)`` are quantized to integer nano-nats
    before the BIGINT per-slice sum — shuffle-order-proof (the
    PSI/zipf/DSIR trick).  Output: one row per slice:
    ``(slice, n_tokens, kl_nano)``.
    """
    tokens = docs.select(
        F.col(slice_col).alias("slice"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term"),
    ).filter("term <> ''")

    # bounded corpus vocabulary with global counts (c_w)
    vocab = (
        tokens.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_w"))
        .orderBy(F.col("c_w").desc(), F.col("term").asc())
        .limit(vocab_size)
    )

    counts = (
        tokens.join(F.broadcast(vocab.select("term")), "term")
        .groupBy("slice", "term")
        .agg(F.count(F.lit(1)).alias("c_sw"))
    )

    # smoothing grid: every (slice, vocab term) cell, zero-filled
    slices = docs.select(F.col(slice_col).alias("slice")).distinct()
    grid = (
        slices.crossJoin(F.broadcast(vocab))
        .join(counts, ["slice", "term"], "left")
        .withColumn("c_sw", F.coalesce(F.col("c_sw"), F.lit(0)))
    )

    totals = grid.groupBy("slice").agg(F.sum("c_sw").alias("n_s"))
    corpus = vocab.agg(
        F.sum("c_w").alias("n_corpus"), F.count(F.lit(1)).alias("v")
    )  # 1 row

    p = (F.col("c_sw") + 1.0) / (F.col("n_s") + F.col("v"))
    q = (F.col("c_w") + 1.0) / (F.col("n_corpus") + F.col("v"))
    return (
        grid.join(totals, "slice")
        .crossJoin(F.broadcast(corpus))
        .select(
            "slice",
            "n_s",
            F.round(p * F.log(p / q) * 1000000000.0)
            .cast("bigint")
            .alias("contrib_nano"),
        )
        .groupBy("slice")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.sum("contrib_nano").alias("kl_nano"),
        )
    )


def unigram_kl_oracle_sql(
    table: str = "documents",
    slice_col: str = "source",
    text_col: str = "text",
    vocab_size: int = 2000,
) -> str:
    """DuckDB twin of :func:`unigram_kl` — identical tokenization,
    vocabulary cut, Laplace smoothing and nano-nat quantization."""
    return f"""
    WITH toks AS (
      SELECT {slice_col} AS slice, t.term
      FROM {table},
           UNNEST(string_split_regex(lower({text_col}), '[^a-z0-9]+')) AS t(term)
      WHERE t.term <> ''
    ), vocab AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c_w
      FROM toks GROUP BY term
      ORDER BY c_w DESC, term ASC LIMIT {vocab_size}
    ), counts AS (
      SELECT slice, term, CAST(count(*) AS BIGINT) AS c_sw
      FROM toks WHERE term IN (SELECT term FROM vocab)
      GROUP BY slice, term
    ), grid AS (
      SELECT s.slice, v.term, v.c_w, COALESCE(c.c_sw, 0) AS c_sw
      FROM (SELECT DISTINCT {slice_col} AS slice FROM {table}) s
      CROSS JOIN vocab v
      LEFT JOIN counts c ON c.slice = s.slice AND c.term = v.term
    ), totals AS (
      SELECT slice, CAST(sum(c_sw) AS BIGINT) AS n_s FROM grid GROUP BY slice
    ), corpus AS (
      SELECT CAST(sum(c_w) AS BIGINT) AS n_corpus,
             CAST(count(*) AS BIGINT) AS v FROM vocab
    ), contrib AS (
      SELECT g.slice, t.n_s,
             CAST(round(((g.c_sw + 1.0) / (t.n_s + c.v))
                        * ln(((g.c_sw + 1.0) / (t.n_s + c.v))
                             / ((g.c_w + 1.0) / (c.n_corpus + c.v)))
                        * 1000000000.0) AS BIGINT) AS contrib_nano
      FROM grid g JOIN totals t USING (slice), corpus c
    )
    SELECT slice, CAST(max(n_s) AS BIGINT) AS n_tokens,
           CAST(sum(contrib_nano) AS BIGINT) AS kl_nano
    FROM contrib GROUP BY slice ORDER BY slice
    """
