"""Bucketed conversation store (pipeline/bucketed.py): plan + parity.

The claim under test is the 10^12-turn one: once turns live bucketed by
conv_id, the ENTIRE quality pipeline plans with zero Exchange nodes —
the write-time shuffle was the last one. Parity: the reordered
(window-first) pipeline emits exactly what run_quality_pipeline emits.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.pipeline.bucketed import (
    quality_pipeline_colocated,
    read_bucketed_turns,
    write_bucketed_turns,
)
from data_quality_automated_evaluator_spark.pipeline.quality import (
    run_quality_pipeline,
)
from data_quality_automated_evaluator_spark.pipeline.rules import RULE_NAMES
from data_quality_automated_evaluator_spark.testdata import generate_transcripts

TABLE = "test_turns_bucketed"


@pytest.fixture(scope="module")
def bucketed_table(spark):
    root = tempfile.mkdtemp(prefix="bucketed_turns_")
    pdf = generate_transcripts(n_convs=300, seed=7)
    df = spark.createDataFrame(pdf)
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    write_bucketed_turns(df, TABLE, root + "/turns", n_buckets=8)
    yield TABLE
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    shutil.rmtree(root, ignore_errors=True)


def test_colocated_pipeline_zero_exchanges(spark, bucketed_table):
    t = read_bucketed_turns(spark, bucketed_table)
    result = quality_pipeline_colocated(t)
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
    # the bucketed layout is actually engaged, not silently ignored
    assert "Bucketed: true" in plan, plan


def test_colocated_pipeline_matches_default(spark, bucketed_table):
    t = read_bucketed_turns(spark, bucketed_table)
    cols = ["conv_id", "turn_idx", "keep", "text_scrubbed", *RULE_NAMES]
    a = quality_pipeline_colocated(t).select(*cols)
    b = run_quality_pipeline(t).select(*cols)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0
    assert a.count() == t.count()


def test_conversation_agg_zero_exchanges(spark, bucketed_table):
    """groupBy(conv_id) aggregations also ride the bucket layout."""
    t = read_bucketed_turns(spark, bucketed_table)
    agg = t.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.max("turn_idx").alias("max_turn"),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
