"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship evaluator-core query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
training-data-pipeline extensions), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Floating-point aggregates are rounded to 6 decimals on BOTH sides so the
driver's order-insensitive value-hash is stable across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.entry_queries import QUERIES, ORACLES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: evaluator-core per-day interval statistics over the
    events table at sf0.001 (SURVEY.md §2.4-2.5, operators D1 + A1-A10)."""
    return QUERIES["interval_stats_events_1d"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
