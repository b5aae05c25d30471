"""Referential-integrity audit: per-FK-edge orphan counts.

The data-quality counterpart of the reference's per-column stat
report (evaluate_data.py): instead of profiling one table, audit the
EDGES between tables — for each declared foreign key, how many child
rows point at a missing parent, and how many carry a NULL key.
Orphans are the classic silent-corruption signal after partial loads,
late-arriving dimensions, or botched backfills.

Scale shape: each edge is a null-filtered LEFT ANTI join on the key
(Spark turns small parent sides into BroadcastHashJoin automatically
under AQE; dimension parents like nation/region are hinted
explicitly) followed by a 1-row aggregate, then a union of the ≤dozen
1-row frames.  No collect, no window — child tables stream through
the anti join with map-side semi-join pushdown, so a 10^12-row fact
edge costs one shuffle of only the key column (the parent build side
is broadcast whenever it fits).

Cross-engine value-hash discipline: every output is an exact BIGINT
count except orphan_rate, a single division of two exact integers —
bit-identical in any engine; round(x, 6) both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["FK_EDGES", "referential_integrity_audit", "integrity_oracle_sql"]

# (edge label, child table, child key, parent table, parent key,
#  broadcast parent?)
FK_EDGES = [
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey", True),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey", False),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey", False),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey", False),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey", True),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey", False),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey", True),
]


def _edge_stats(
    edge: str,
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    hint_broadcast: bool,
) -> DataFrame:
    keys = child.select(F.col(child_key).alias("__fk"))
    totals = keys.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.count_if(F.col("__fk").isNull()).alias("n_null_fk"),
    )
    parent_keys = parent.select(F.col(parent_key).alias("__pk")).distinct()
    if hint_broadcast:
        parent_keys = F.broadcast(parent_keys)
    orphans = (
        keys.where(F.col("__fk").isNotNull())
        .join(parent_keys, F.col("__fk") == F.col("__pk"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    return totals.crossJoin(orphans).select(
        F.lit(edge).alias("edge"),
        "n_child",
        "n_null_fk",
        "n_orphans",
        F.round(
            F.when(
                F.col("n_child") > 0,
                F.col("n_orphans") * 1.0 / F.col("n_child"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("orphan_rate"),
    )


def referential_integrity_audit(
    spark: SparkSession, sf_dir: str, edges=FK_EDGES
) -> DataFrame:
    """One row per FK edge: child rows, NULL keys, orphans, orphan
    rate — sorted by edge label for deterministic comparison."""
    out = None
    for edge, ct, ck, pt, pk, bcast in edges:
        child = spark.read.parquet(f"{sf_dir}/{ct}.parquet")
        parent = spark.read.parquet(f"{sf_dir}/{pt}.parquet")
        stats = _edge_stats(edge, child, ck, parent, pk, bcast)
        out = stats if out is None else out.unionByName(stats)
    return out.orderBy("edge")


def integrity_oracle_sql(edges=FK_EDGES) -> str:
    """DuckDB twin: identical per-edge counts via NOT EXISTS."""
    parts = []
    for edge, ct, ck, pt, pk, _ in edges:
        parts.append(f"""
        SELECT '{edge}' AS edge,
               (SELECT count(*) FROM {ct}) AS n_child,
               (SELECT count(*) FROM {ct} WHERE {ck} IS NULL) AS n_null_fk,
               (SELECT count(*) FROM {ct} c
                 WHERE c.{ck} IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM {pt} p
                                   WHERE p.{pk} = c.{ck})) AS n_orphans,
               round(CASE WHEN (SELECT count(*) FROM {ct}) > 0
                     THEN (SELECT count(*) FROM {ct} c
                            WHERE c.{ck} IS NOT NULL
                              AND NOT EXISTS (SELECT 1 FROM {pt} p
                                              WHERE p.{pk} = c.{ck}))
                          * 1.0 / (SELECT count(*) FROM {ct})
                     ELSE 0.0 END, 6) AS orphan_rate
        """)
    return " UNION ALL ".join(parts) + " ORDER BY edge"
