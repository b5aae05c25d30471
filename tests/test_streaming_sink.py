"""Streaming file sink: checkpointed exactly-once across restarts.

Run the stateless quality stream into a parquet sink with a checkpoint,
stop it, append new source files, restart with the SAME checkpoint —
the resumed query must process only the new files and the sink must
hold every turn exactly once."""

from __future__ import annotations

import pandas as pd

from data_quality_automated_evaluator_spark.streaming.quality_stream import (
    streaming_turn_quality,
)
from data_quality_automated_evaluator_spark.testdata import generate_transcripts


def _run_to_sink(spark, schema, src, sink, ckpt):
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_turn_quality(stream)
        .select("conv_id", "turn_idx", "keep_turn", "text_scrubbed")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streaming_sink_exactly_once_across_restart(spark, tmp_path):
    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    first = generate_transcripts(n_convs=80, seed=21)
    sdf = spark.createDataFrame(first)
    sdf.coalesce(1).write.mode("overwrite").parquet(str(src / "batch0"))

    _run_to_sink(spark, sdf.schema, str(src) + "/*", sink, ckpt)
    got1 = spark.read.parquet(sink).toPandas()
    assert len(got1) == len(first)

    # restart with NEW data appended; same checkpoint
    second = generate_transcripts(n_convs=40, seed=22)
    second = second.assign(conv_id="r2_" + second["conv_id"])
    spark.createDataFrame(second).coalesce(1).write.mode("overwrite").parquet(
        str(src / "batch1")
    )
    _run_to_sink(spark, sdf.schema, str(src) + "/*", sink, ckpt)

    got2 = spark.read.parquet(sink).toPandas()
    assert len(got2) == len(first) + len(second)
    # exactly-once: no duplicate turns even though batch0 was still present
    dupes = got2.duplicated(subset=["conv_id", "turn_idx"]).sum()
    assert dupes == 0
    # a third run with nothing new appends nothing
    _run_to_sink(spark, sdf.schema, str(src) + "/*", sink, ckpt)
    got3 = spark.read.parquet(sink)
    assert got3.count() == len(got2)
