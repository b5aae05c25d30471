"""applyInPandasWithState conversation assembly: state must carry across
micro-batch boundaries and tolerate out-of-order arrival within a
conversation. Source is split so each conversation's turns span two
files processed as separate micro-batches (maxFilesPerTrigger=1)."""

from __future__ import annotations

import pandas as pd
import pytest

from data_quality_automated_evaluator_spark.pipeline.reassembly import (
    reassemble_conversations,
)
from data_quality_automated_evaluator_spark.streaming.stateful import (
    streaming_reassembly,
)
from data_quality_automated_evaluator_spark.testdata import generate_transcripts


@pytest.fixture(scope="module")
def split_source(spark, tmp_path_factory):
    """Transcripts written as two files: even turn_idx first, odd second —
    every multi-turn conversation is incomplete after batch 1."""
    src = tmp_path_factory.mktemp("stateful_src")
    pdf = generate_transcripts(n_convs=60, seed=7)
    sdf = spark.createDataFrame(pdf)
    even = sdf.filter("turn_idx % 2 = 0").coalesce(1)
    odd = sdf.filter("turn_idx % 2 = 1").coalesce(1)
    even.write.mode("overwrite").parquet(str(src / "b0"))
    odd.write.mode("overwrite").parquet(str(src / "b1"))
    return str(src), sdf, pdf


def test_stateful_assembly_matches_batch(spark, split_source, tmp_path):
    src, sdf, pdf = split_source
    stream = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = streaming_reassembly(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from conv_state").toPandas()

    # update mode emits one snapshot per conversation per touching batch;
    # the final snapshot (max n_turns per conv) is the complete one.
    final = (
        got.sort_values("n_turns")
        .groupby("conv_id", as_index=False)
        .last()
        .set_index("conv_id")
    )

    batch = (
        reassemble_conversations(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("conv_id")
    )
    assert set(final.index) == set(batch.index)
    for conv_id, row in batch.iterrows():
        f = final.loc[conv_id]
        assert f["n_turns"] == row["n_turns"], conv_id
        assert f["n_role_violations"] == row["n_role_violations"], conv_id
        assert f["first_role"] == row["first_role"], conv_id
        assert f["is_contiguous"] == 1, conv_id

    # state genuinely crossed batches: some convs were snapshotted twice
    multi = got.groupby("conv_id").size()
    assert (multi >= 2).any(), "no conversation spanned two micro-batches"
    # and intermediate snapshots were partial (fewer turns than final)
    partial = got.sort_values("n_turns").groupby("conv_id").first()
    spanned = multi[multi >= 2].index
    assert (
        partial.loc[spanned, "n_turns"] < final.loc[spanned, "n_turns"]
    ).all()


def test_stateful_out_of_order_within_conv(spark, tmp_path):
    """Turns arrive in reverse turn_idx order across batches — the sorted
    snapshot must still count role violations on logical order."""
    rows = [
        ("c1", 0, "user", "hi", pd.Timestamp("2024-01-01 00:00:00")),
        ("c1", 1, "assistant", "hello", pd.Timestamp("2024-01-01 00:00:10")),
        ("c1", 2, "assistant", "again", pd.Timestamp("2024-01-01 00:00:20")),
        ("c1", 3, "user", "ok", pd.Timestamp("2024-01-01 00:00:30")),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "ts"])
    sdf = spark.createDataFrame(pdf)
    src = tmp_path / "ooo_src"
    # later turns land in the FIRST file
    sdf.filter("turn_idx >= 2").coalesce(1).write.parquet(str(src / "b0"))
    sdf.filter("turn_idx < 2").coalesce(1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        streaming_reassembly(stream)
        .writeStream.format("memory")
        .queryName("ooo_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from ooo_state").toPandas()
    final = got.sort_values("n_turns").iloc[-1]
    assert final["n_turns"] == 4
    assert final["n_role_violations"] == 1  # assistant->assistant at idx 1->2
    assert final["first_role"] == "user"
    assert final["is_contiguous"] == 1
    assert final["duration_sec"] == 30
