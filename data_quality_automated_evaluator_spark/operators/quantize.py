"""Scalar (int8) quantization of embedding columns — the simple
4x-compression path (float32 -> uint8 per dimension) used when PQ's
codebook training is overkill: per-dimension affine quantization
``code_i = round((x_i - min_i) / (max_i - min_i) * 255)``.

Spark-first shape:

* **train** (`sq_train`): per-dimension min/max via ONE HashAggregate
  with ``2 * dim`` agg expressions over ``element_at`` projections —
  no posexplode (which would shuffle dim x corpus rows), map-side
  partials, bounded O(dim) driver collect.  Bounds are rounded to 6
  decimals inside the engine (same convention as kmeans/pq) so the
  DuckDB oracle reproduces them bit-for-bit.
* **encode** (`sq_encode_col`): pure-Catalyst ``transform`` over the
  vector zipped with the literal bounds — map-only, whole-stage
  codegen; degenerate dimensions (max == min) quantize to 0.
* **decode** (`sq_decode_col`): ``min_i + code_i / 255 * (max_i -
  min_i)`` — used by the reconstruction-error audit.

At 10^12 rows the bounds pass is one cheap scan (the same scan that
computes corpus stats can piggyback it) and encoding is embarrassingly
parallel; the 4x-smaller codes then feed PQ/ANN or ship to storage.

``sq_oracle_sql`` generates the DuckDB twin (same bounds, same
rounding, same clamp) for value-checking codes AND the per-row
reconstruction MSE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sq_train",
    "sq_encode_col",
    "sq_decode_col",
    "sq_encode",
    "sq_oracle_sql",
]


def sq_train(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[list[float], list[float]]:
    """Per-dimension (mins, maxes), rounded to 6dp in-engine. One
    HashAggregate job, O(dim) driver collect."""
    if dim is None:
        row = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if row is None or not row["d"]:
            raise ValueError(f"cannot infer vector dim from {vec_col!r}")
        dim = int(row["d"])
    v = F.col(vec_col).cast("array<double>")
    aggs = []
    for i in range(dim):
        aggs.append(F.round(F.min(F.element_at(v, i + 1)), 6).alias(f"mn{i}"))
        aggs.append(F.round(F.max(F.element_at(v, i + 1)), 6).alias(f"mx{i}"))
    r = df.agg(*aggs).first()
    mins = [float(r[f"mn{i}"]) for i in range(dim)]
    maxes = [float(r[f"mx{i}"]) for i in range(dim)]
    return mins, maxes


def _bounds_lits(mins: list[float], maxes: list[float]) -> tuple[Column, Column]:
    return (
        F.array(*[F.lit(float(x)) for x in mins]),
        F.array(*[F.lit(float(x)) for x in maxes]),
    )


def sq_encode_col(mins: list[float], maxes: list[float], v: Column) -> Column:
    """array<int> of uint8 codes; degenerate dims (max == min) -> 0.
    round() is half-away-from-zero in both Spark and DuckDB, and the
    affine expression is evaluated in the same order on both sides, so
    codes are value-checkable."""
    mn, mx = _bounds_lits(mins, maxes)
    vd = v.cast("array<double>")
    zipped = F.zip_with(
        vd,
        F.zip_with(mn, mx, lambda a, b: F.struct(a.alias("mn"), b.alias("mx"))),
        lambda x, b: F.when(b["mx"] > b["mn"],
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.round((x - b["mn"]) / (b["mx"] - b["mn"]) * 255, 0)
                    .cast("int"),
                ),
            ),
        ).otherwise(F.lit(0)),
    )
    return zipped


def sq_decode_col(mins: list[float], maxes: list[float], codes: Column) -> Column:
    """Dequantize codes back to approximate doubles."""
    mn, mx = _bounds_lits(mins, maxes)
    return F.zip_with(
        codes.cast("array<double>"),
        F.zip_with(mn, mx, lambda a, b: F.struct(a.alias("mn"), b.alias("mx"))),
        lambda c, b: b["mn"] + c / 255.0 * (b["mx"] - b["mn"]),
    )


def sq_encode(
    df: DataFrame,
    mins: list[float],
    maxes: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    with_mse: bool = True,
) -> DataFrame:
    """(id, codes, [recon_mse rounded 6dp]) — map-only."""
    v = F.col(vec_col).cast("array<double>")
    out = df.select(F.col(id_col), v.alias("_v")).withColumn(
        "codes", sq_encode_col(mins, maxes, F.col("_v"))
    )
    if not with_mse:
        return out.select(id_col, "codes")
    dec = sq_decode_col(mins, maxes, F.col("codes"))
    mse = F.aggregate(
        F.zip_with(F.col("_v"), dec, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size(F.col("codes"))
    return out.select(id_col, "codes", F.round(mse, 6).alias("recon_mse"))


def sq_oracle_sql(table: str, dim: int = 64, with_mse: bool = True) -> str:
    """DuckDB twin of sq_train + sq_encode(+MSE). Bounds are recomputed
    from the corpus with the same 6dp rounding; encode/decode use the
    identical affine expressions and clamp."""
    rng = f"range(1, {dim + 1})"
    mse_sel = (
        ", round(list_sum(list_transform("
        f"{rng}, i -> (v[i] - (b.mn[i] + "
        "least(255, greatest(0, CAST(round((v[i] - b.mn[i]) / "
        "(CASE WHEN b.mx[i] > b.mn[i] THEN b.mx[i] - b.mn[i] ELSE 1 END)"
        " * 255, 0) AS INT))) * "
        "CASE WHEN b.mx[i] > b.mn[i] THEN 1 ELSE 0 END"
        " / 255.0 * (b.mx[i] - b.mn[i]))) * (v[i] - (b.mn[i] + "
        "least(255, greatest(0, CAST(round((v[i] - b.mn[i]) / "
        "(CASE WHEN b.mx[i] > b.mn[i] THEN b.mx[i] - b.mn[i] ELSE 1 END)"
        " * 255, 0) AS INT))) * "
        "CASE WHEN b.mx[i] > b.mn[i] THEN 1 ELSE 0 END"
        f" / 255.0 * (b.mx[i] - b.mn[i])))))/{dim}, 6) AS recon_mse"
        if with_mse
        else ""
    )
    return f"""
    WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
    bounds AS (
      SELECT list(round(mn, 6) ORDER BY i) AS mn,
             list(round(mx, 6) ORDER BY i) AS mx
      FROM (
        SELECT i.i AS i, min(v[i.i]) AS mn, max(v[i.i]) AS mx
        FROM vecs, (SELECT UNNEST({rng}) AS i) i GROUP BY i.i
      )
    )
    SELECT vec_id,
           array_to_string(list_transform({rng}, i ->
             CASE WHEN b.mx[i] > b.mn[i]
                  THEN least(255, greatest(0, CAST(round(
                       (v[i] - b.mn[i]) / (b.mx[i] - b.mn[i]) * 255, 0)
                       AS INT)))
                  ELSE 0 END), '-') AS codes{mse_sel}
    FROM vecs, bounds b ORDER BY vec_id
    """
