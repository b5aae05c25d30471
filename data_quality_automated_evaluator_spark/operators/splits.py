"""Deterministic train/valid/test splits and cross-split leakage audit.

A training-data pipeline must assign every document to a split by a
content-stable hash (re-runs and late-arriving shards land in the same
split — no RNG, no row order dependence) and then PROVE no duplicate
content crosses split boundaries, or held-out metrics are contaminated.
The reference evaluator has no split notion (it is a single-table QA
tool); this is part of the LLM-pipeline extension surface.

Cross-engine determinism: the split hash is the first 4 hex nibbles of
``md5(doc_id)`` Horner-folded to 0..65535 then ``mod 100`` — every
construct (md5 / substring / instr / arithmetic) evaluates identically
in Spark SQL and DuckDB (the simhash md5-nibble trick,
:mod:`.dedup`). Leak detection digests ``md5(text)`` — exact-content
identity, the same key as exact dedup.

Scale shape: one ``groupBy(digest)`` (uniform key) to find digests
spanning >1 split, one digest-keyed self-equijoin to attribute leaked
docs, then a #splits-sized rollup. No text ever shuffles — only 32-byte
digests and the split tag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "split_column",
    "split_leakage",
    "split_leakage_oracle_sql",
]

_HEX = "0123456789abcdef"


def _nibble(col: Column, i: int) -> Column:
    return F.instr(F.lit(_HEX), F.substring(col, i, 1)) - 1


def split_column(
    key: Column, train_pct: int = 80, valid_pct: int = 10
) -> Column:
    """'train' / 'valid' / 'test' from a content-stable md5 bucket.

    ``bucket = horner(md5(key)[0:4 nibbles]) % 100``; train takes
    ``[0, train_pct)``, valid the next ``valid_pct``, test the rest.
    """
    h = F.md5(key.cast("string"))
    v = F.lit(0)
    for i in range(1, 5):
        v = v * 16 + _nibble(h, i)
    bucket = v % 100
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def split_leakage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """Per-split sizes and cross-split exact-content leakage.

    Returns one row per split: ``n_docs``, ``n_leaked_docs`` (docs whose
    text digest also appears in another split), ``n_leaked_digests``
    (distinct such digests present in the split) and ``leak_rate``.
    """
    d = df.select(
        F.col(id_col).alias("id"),
        split_column(F.col(id_col), train_pct, valid_pct).alias("split"),
        F.md5(F.col(text_col)).alias("digest"),
    )
    g = d.groupBy("digest").agg(
        (F.countDistinct("split") > 1).alias("leaked")
    )
    j = d.join(g, "digest")
    return (
        j.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("leaked").cast("int")).alias("n_leaked_docs"),
            F.countDistinct(
                F.when(F.col("leaked"), F.col("digest"))
            ).alias("n_leaked_digests"),
        )
        .select(
            "split",
            "n_docs",
            "n_leaked_docs",
            "n_leaked_digests",
            F.round(
                F.col("n_leaked_docs") / F.col("n_docs"), 6
            ).alias("leak_rate"),
        )
        .orderBy("split")
    )


def split_leakage_oracle_sql(
    base_sql: str,
    id_: str,
    text: str,
    train_pct: int = 80,
    valid_pct: int = 10,
) -> str:
    """DuckDB twin of :func:`split_leakage` over ``base_sql``."""
    nib = (
        lambda i: f"(instr('{_HEX}', substring(h, {i}, 1)) - 1)"
    )  # noqa: E731
    horner = f"((({nib(1)} * 16 + {nib(2)}) * 16 + {nib(3)}) * 16 + {nib(4)})"
    return f"""
    WITH base AS ({base_sql}),
    hashed AS (
      SELECT {id_} AS id, md5({text}) AS digest,
             md5(CAST({id_} AS VARCHAR)) AS h
      FROM base
    ),
    d AS (
      SELECT id, digest,
             CASE WHEN {horner} % 100 < {train_pct} THEN 'train'
                  WHEN {horner} % 100 < {train_pct + valid_pct}
                    THEN 'valid'
                  ELSE 'test' END AS split
      FROM hashed
    ),
    g AS (
      SELECT digest, count(DISTINCT split) > 1 AS leaked
      FROM d GROUP BY digest
    )
    SELECT d.split, count(*) AS n_docs,
           sum(CAST(g.leaked AS INT)) AS n_leaked_docs,
           count(DISTINCT CASE WHEN g.leaked THEN d.digest END)
             AS n_leaked_digests,
           round(sum(CAST(g.leaked AS INT)) / CAST(count(*) AS DOUBLE), 6)
             AS leak_rate
    FROM d JOIN g ON d.digest = g.digest
    GROUP BY d.split ORDER BY d.split
    """
