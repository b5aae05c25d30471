"""Observable-metrics telemetry: counters ride the caller's one action.

Batch: attach an Observation to the full pipeline result, run a single
action, and the observed counters must equal what a separate aggregation
over the same frame computes. Streaming: the same metric expressions
registered by name must surface per-micro-batch in
StreamingQueryProgress and fold to the input totals."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_automated_evaluator_spark.pipeline.observability import (
    attach_quality_observation,
    attach_streaming_quality_observation,
    sum_observed_progress,
)
from data_quality_automated_evaluator_spark.pipeline.quality import run_quality_pipeline
from data_quality_automated_evaluator_spark.pipeline.rules import RULE_NAMES
from data_quality_automated_evaluator_spark.streaming.quality_stream import (
    streaming_turn_quality,
)
from data_quality_automated_evaluator_spark.testdata import generate_transcripts


def test_batch_observation_matches_direct_aggregation(spark):
    pdf = generate_transcripts(n_convs=120, seed=7)
    result = run_quality_pipeline(spark.createDataFrame(pdf))

    observed, obs = attach_quality_observation(result)
    n_rows = observed.count()  # the ONE action; metrics ride it

    got = obs.get
    # ground truth from a plain aggregation over the same lazy frame
    truth_row = result.agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum(F.length("text_scrubbed").cast("long")).alias("scrubbed_chars"),
        F.countDistinct("conv_id").alias("n_convs"),
        *[
            F.sum((~F.col(r)).cast("long")).alias(f"fail_{r}")
            for r in RULE_NAMES
        ],
    ).collect()[0]
    truth = truth_row.asDict()

    assert got["n_turns"] == n_rows == len(pdf)
    assert got["n_kept"] == truth["n_kept"]
    assert got["scrubbed_chars"] == truth["scrubbed_chars"]
    for r in RULE_NAMES:
        assert got[f"fail_{r}"] == truth[f"fail_{r}"], r
    # HLL estimate: exact on this cardinality at default rsd would be
    # brittle to assert; require the standard ±5% envelope instead
    assert abs(got["n_convs_approx"] - truth["n_convs"]) <= max(
        1, int(0.05 * truth["n_convs"])
    )
    # at least one rule must actually fire on the fixture, else the
    # equalities above prove nothing
    assert sum(got[f"fail_{r}"] for r in RULE_NAMES) > 0


def test_sink_run_summary_reports_rule_failures(spark, tmp_path):
    from data_quality_automated_evaluator_spark.pipeline.sinks import QualitySink

    pdf = generate_transcripts(n_convs=80, seed=13)
    sdf = spark.createDataFrame(pdf)
    s = QualitySink(str(tmp_path / "sink")).run(sdf)

    assert set(s["rule_failures"]) == set(RULE_NAMES)
    truth = (
        run_quality_pipeline(sdf)
        .agg(*[F.sum((~F.col(r)).cast("long")).alias(r) for r in RULE_NAMES])
        .collect()[0]
        .asDict()
    )
    # the sink drops NULL-ts rows before the pipeline; the fixture has
    # none, so the observed batch equals the full input
    assert s["n_null_ts"] == 0
    assert s["rule_failures"] == truth


def test_streaming_observation_totals(spark, tmp_path):
    pdf = generate_transcripts(n_convs=60, seed=11)
    sdf = spark.createDataFrame(pdf)
    src = str(tmp_path / "src")
    sdf.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(sdf.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = attach_streaming_quality_observation(streaming_turn_quality(stream))
    q = (
        out.select("conv_id", "turn_idx", "keep_turn", "text_scrubbed")
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    totals = sum_observed_progress(q.recentProgress)
    assert totals["n_turns"] == len(pdf)
    truth = (
        streaming_turn_quality(spark.read.parquet(src))
        .agg(F.sum(F.col("keep_turn").cast("long")))
        .collect()[0][0]
    )
    assert totals["n_kept"] == truth
    # per-turn rule counters are present; conversation-level ones are not
    assert "fail_r_len" in totals and "fail_c_n_turns" not in totals
