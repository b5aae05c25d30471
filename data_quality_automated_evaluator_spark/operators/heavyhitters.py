"""Exact corpus heavy hitters without a full-vocabulary shuffle.

``trending_terms``/``vocab_topk`` shuffle every distinct (key, word)
pair — fine per day, but the CORPUS-WIDE frequent-term query at 10^12
turns would shuffle the entire vocabulary. This operator gets the exact
answer with bounded memory and a candidates-only shuffle:

1. **Candidate sweep** — a Misra-Gries summary per partition via
   ``mapInPandas`` (Arrow batches; per-batch counts come from
   vectorized ``value_counts``, the sketch dict holds ≤ ``cap`` terms).
   MG's guarantee: a term undercounts by at most ``n_p / (cap+1)``
   in partition ``p`` (each prune subtracts its δ from ≥ cap+1
   counters, so Σδ ≤ n_p/(cap+1)). By pigeonhole, any term with global
   frequency > n/k exceeds n_p/k in some partition, so with
   ``cap ≥ k`` it survives that partition's sketch: the candidate
   union is a SUPERSET of the true heavy hitters. Only ≤ partitions ×
   cap candidate strings ever leave the executors.
2. **Exact recount** — a broadcast semi-join gates the corpus to
   candidate terms only, one map-side-combined count per candidate,
   and the ``> n/k`` filter (against the exact corpus token total)
   removes the false positives. Output = exactly the terms with
   frequency > n/k, independent of partitioning and batch boundaries.

Cost at scale: three map-heavy corpus passes (sketch, total, recount)
and a shuffle of candidate partials only — vs one pass that shuffles
the full vocabulary. The passes win as soon as the vocabulary stops
fitting the shuffle comfortably, which at web scale is immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters_exact", "heavy_hitters_oracle_sql"]


def _words(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(
            F.explode(
                F.split(
                    F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                    "[^a-z0-9]+",
                )
            ).alias("w")
        )
        .filter(F.col("w") != "")
    )


def heavy_hitters_exact(
    df: DataFrame, text_col: str, k: int = 100, cap: int | None = None
) -> DataFrame:
    """Exact terms with frequency strictly greater than ``n_tokens/k``.

    ``cap`` (default ``8*k``) is the per-partition sketch size; any
    ``cap ≥ k`` preserves exactness — larger caps only shrink the
    false-positive candidate set the recount has to erase.
    """
    if cap is None:
        cap = 8 * k
    if cap < k:
        raise ValueError(f"cap={cap} must be >= k={k} for exactness")
    words = _words(df, text_col)

    def mg(batches):
        import pandas as pd

        sketch: dict[str, int] = {}
        for pdf in batches:
            for term, c in pdf["w"].value_counts().items():
                sketch[term] = sketch.get(term, 0) + int(c)
            if len(sketch) > cap:
                counts = sorted(sketch.values(), reverse=True)
                delta = counts[cap]  # (cap+1)-th largest
                sketch = {
                    t: c - delta for t, c in sketch.items() if c > delta
                }
        yield pd.DataFrame({"w": list(sketch.keys())})

    candidates = words.mapInPandas(mg, "w string").distinct()
    total = words.agg(F.count(F.lit(1)).alias("n_tokens"))
    recount = (
        words.join(F.broadcast(candidates), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        recount.crossJoin(F.broadcast(total))
        .where(F.col("n") > F.col("n_tokens") / F.lit(float(k)))
        .select(
            "w",
            "n",
            F.round(F.col("n") / F.col("n_tokens"), 6).alias("freq"),
        )
        .orderBy(F.col("n").desc(), "w")
    )


def heavy_hitters_oracle_sql(base_sql: str, text: str, k: int = 100) -> str:
    """DuckDB twin: the exact definition, brute-force."""
    return f"""
    WITH base AS ({base_sql}),
    words AS (
      SELECT unnest(string_split_regex(lower(coalesce({text}, '')),
                                       '[^a-z0-9]+')) AS w
      FROM base
    ),
    clean AS (SELECT w FROM words WHERE w <> ''),
    total AS (SELECT count(*) AS n_tokens FROM clean),
    counts AS (SELECT w, count(*) AS n FROM clean GROUP BY w)
    SELECT c.w, c.n,
           round(c.n / CAST(t.n_tokens AS DOUBLE), 6) AS freq
    FROM counts c, total t
    WHERE c.n > t.n_tokens / {float(k)}
    ORDER BY c.n DESC, c.w
    """
