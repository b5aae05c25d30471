"""Checkpoint/resume at partition granularity (north_rule): a run that
stops after k partitions and is then resumed must produce byte-identical
outputs to a single uninterrupted run, and must not reprocess completed
partitions."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from data_quality_automated_evaluator_spark.pipeline.sinks import QualitySink
from data_quality_automated_evaluator_spark.testdata import generate_transcripts


@pytest.fixture(scope="module")
def sdf(spark):
    pdf = generate_transcripts(n_convs=300, seed=7)
    return spark.createDataFrame(pdf)


def _read_sorted(spark, sink: QualitySink) -> pd.DataFrame:
    return (
        sink.read_turns(spark)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_resume_equivalence(spark, sdf, tmp_path_factory):
    full_root = str(tmp_path_factory.mktemp("sink_full"))
    part_root = str(tmp_path_factory.mktemp("sink_partial"))

    # uninterrupted run
    full = QualitySink(full_root)
    s1 = full.run(sdf)
    assert s1["processed_partitions"] > 2

    # interrupted run: only 2 partitions, then resume
    part = QualitySink(part_root)
    s2 = part.run(sdf, batch_days=2)
    assert s2["processed_partitions"] == 2
    assert len(part.completed_partitions()) == 2

    s3 = part.run(sdf)  # resume the rest
    assert s3["skipped_partitions"] == 2
    assert s3["processed_partitions"] == s1["processed_partitions"] - 2

    a = _read_sorted(spark, full)
    b = _read_sorted(spark, part)
    assert len(a) == len(b)
    for col in ["conv_id", "turn_idx", "keep", "text_scrubbed"]:
        assert (a[col].fillna("@") == b[col].fillna("@")).all(), col

    # a fully-resumed sink does nothing on re-run (idempotence)
    s4 = part.run(sdf)
    assert s4["processed_partitions"] == 0


def test_partition_discovery_uses_parquet_footers(spark, sdf, tmp_path_factory):
    """Discovery over a parquet-backed input must come from footer
    statistics (metadata-only), not a distinct() scan, and must cover the
    full contiguous date range of ts."""
    from data_quality_automated_evaluator_spark.pipeline.sinks import (
        _parquet_footer_ts_bounds,
    )

    src = str(tmp_path_factory.mktemp("discovery") / "transcripts")
    sdf.write.mode("overwrite").parquet(src)
    pdf = spark.read.parquet(src)

    bounds = _parquet_footer_ts_bounds(pdf, "ts")
    assert bounds is not None, "footer path must engage for parquet input"
    parts = QualitySink.discover_partitions(pdf)
    truth = sorted(
        str(r[0]) for r in
        pdf.selectExpr("to_date(ts) d").distinct().collect()
    )
    # footer-derived candidates are a contiguous superset of the truth
    assert set(truth) <= set(parts)
    assert parts[0] == truth[0] and parts[-1] == truth[-1]
    # non-parquet input falls back (still no shuffle — min/max agg)
    assert _parquet_footer_ts_bounds(sdf, "ts") is None
    assert set(truth) <= set(QualitySink.discover_partitions(sdf))


def test_stats_incremental_and_convergent(spark, sdf, tmp_path_factory):
    """The incremental partial-stats artifact must fold to exactly what a
    full interval_rule_stats pass over the whole written table computes,
    whether the run was interrupted+resumed or uninterrupted."""
    from data_quality_automated_evaluator_spark.pipeline.quality import (
        interval_rule_stats,
    )

    root = str(tmp_path_factory.mktemp("sink_stats"))
    sink = QualitySink(root)
    sink.run(sdf, batch_days=2)
    sink.run(sdf)  # resume the rest — partials written per batch

    folded = (
        sink.read_stats(spark).toPandas().sort_values("__time_interval")
        .reset_index(drop=True)
    )
    full = (
        interval_rule_stats(sink.read_turns(spark)).toPandas()
        .sort_values("__time_interval").reset_index(drop=True)
    )
    assert len(folded) == len(full) > 0
    for col in full.columns:
        assert (folded[col].values == full[col].values).all(), col
    # the stats artifact on disk matches the folded view
    stored = (
        spark.read.parquet(sink.stats_dir).toPandas()
        .sort_values("__time_interval").reset_index(drop=True)
    )
    for col in full.columns:
        assert (stored[col].values == full[col].values).all(), col


def test_ledger_entries_carry_lineage(spark, sdf, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sink_lineage"))
    sink = QualitySink(root)
    sink.run(sdf, batch_days=1)
    files = [f for f in os.listdir(sink.ledger_dir) if f.endswith(".json")]
    assert len(files) == 1
    entry = json.load(open(os.path.join(sink.ledger_dir, files[0])))
    for key in ["part_date", "n_turns", "n_keep", "n_convs", "scrubbed_chars",
                "run_wall_sec", "thresholds", "completed_at"]:
        assert key in entry, key
    assert entry["n_turns"] > 0


def test_stats_interval_change_no_granularity_mixing(spark, sdf, tmp_path_factory):
    """Switching time_interval between runs must NOT mix bucket
    granularities: each interval gets its own partials tree, and
    partitions completed under the old interval are backfilled once."""
    from data_quality_automated_evaluator_spark.pipeline.quality import (
        interval_rule_stats,
    )

    root = str(tmp_path_factory.mktemp("sink_iv"))
    sink = QualitySink(root)
    sink.run(sdf, time_interval="1d", batch_days=2)
    sink.run(sdf, time_interval="1h")  # rest of the partitions, NEW interval

    hourly = (
        sink.read_stats(spark, "1h").toPandas()
        .sort_values("__time_interval").reset_index(drop=True)
    )
    full = (
        interval_rule_stats(sink.read_turns(spark), "1h").toPandas()
        .sort_values("__time_interval").reset_index(drop=True)
    )
    # the hourly artifact covers the WHOLE table (old-interval partitions
    # were backfilled) and matches a full recompute exactly
    assert len(hourly) == len(full) > 0
    for col in full.columns:
        assert (hourly[col].values == full[col].values).all(), col
    # the daily tree still folds to pure-daily buckets for its partitions
    daily = sink.read_stats(spark, "1d").toPandas()
    assert len(daily) > 0


def test_backfill_of_initially_empty_date(spark, sdf, tmp_path_factory):
    """A date inside the range that has no rows yet is zero-ledgered (for
    progress) and re-checked on later runs, so late-arriving data for it
    is still processed."""
    from pyspark.sql import functions as F

    dates = sorted(
        str(r[0]) for r in sdf.selectExpr("to_date(ts) d").distinct().collect()
    )
    hole = dates[len(dates) // 2]
    first = sdf.filter(F.to_date("ts") != hole)

    root = str(tmp_path_factory.mktemp("sink_backfill"))
    sink = QualitySink(root)
    s1 = sink.run(first)
    # every candidate in the contiguous range is processed; the empty hole
    # (and any natural gap dates) are zero-ledgered — progress guarantee
    # for batch_days-limited runs
    import datetime as dt

    n_range = (dt.date.fromisoformat(dates[-1]) - dt.date.fromisoformat(dates[0])).days + 1
    assert s1["processed_partitions"] == n_range
    assert sink.ledger_entries()[hole]["n_turns"] == 0

    # …but when its data "arrives", the zero-date re-check reprocesses it
    s2 = sink.run(sdf)
    assert s2["processed_partitions"] == 1
    assert s2["n_turns"] > 0
    assert sink.ledger_entries()[hole]["n_turns"] > 0
    got = sink.read_turns(spark).selectExpr("to_date(ts) d").distinct().count()
    assert got == len(dates)
    # fully caught up: nothing pending, zero-recheck finds nothing new
    s3 = sink.run(sdf)
    assert s3["processed_partitions"] == 0


def test_null_ts_rows_surfaced_not_silently_dropped(spark, sdf, tmp_path_factory):
    from pyspark.sql import functions as F

    dirty = sdf.unionAll(
        sdf.limit(3).withColumn("ts", F.lit(None).cast("timestamp"))
    )
    root = str(tmp_path_factory.mktemp("sink_nullts"))
    s = QualitySink(root).run(dirty)
    assert s["n_null_ts"] == 3
    assert s["n_turns"] == sdf.count()


def test_batch_days_progresses_past_empty_dates(spark, sdf, tmp_path_factory):
    """batch_days-limited runs must not livelock on an empty in-range
    date: the empty date is zero-ledgered and the next run moves on."""
    from pyspark.sql import functions as F

    dates = sorted(
        str(r[0]) for r in sdf.selectExpr("to_date(ts) d").distinct().collect()
    )
    hole = dates[1]  # second date empty → selected early by batch_days
    src = sdf.filter(F.to_date("ts") != hole)

    root = str(tmp_path_factory.mktemp("sink_livelock"))
    sink = QualitySink(root)
    seen_processed = 0
    for _ in range(4):
        s = sink.run(src, batch_days=1)
        seen_processed += s["processed_partitions"]
    # four runs, four candidate dates consumed (one of them the empty
    # hole) — never stuck re-selecting the same empty date
    assert seen_processed == 4
    assert len(sink.completed_partitions()) == 4
    assert sink.ledger_entries()[hole]["n_turns"] == 0
    assert sink.ledger_entries()[dates[2]]["n_turns"] > 0


def test_interval_switch_with_nothing_pending(spark, sdf, tmp_path_factory):
    """Switching time_interval when all partitions are already complete
    must still build the new granularity's partials (early-return path)."""
    from data_quality_automated_evaluator_spark.pipeline.quality import (
        interval_rule_stats,
    )

    root = str(tmp_path_factory.mktemp("sink_iv2"))
    sink = QualitySink(root)
    sink.run(sdf, time_interval="1d")  # everything completes at 1d

    s = sink.run(sdf, time_interval="1h")  # no pending work, new interval
    assert s["processed_partitions"] == 0

    hourly = (
        sink.read_stats(spark, "1h").toPandas()
        .sort_values("__time_interval").reset_index(drop=True)
    )
    full = (
        interval_rule_stats(sink.read_turns(spark), "1h").toPandas()
        .sort_values("__time_interval").reset_index(drop=True)
    )
    assert len(hourly) == len(full) > 0
    for col in full.columns:
        assert (hourly[col].values == full[col].values).all(), col
