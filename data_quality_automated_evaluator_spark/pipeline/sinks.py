"""Resumable partition-granular sinks for the quality pipeline.

Production target is Iceberg (``df.writeTo(tbl).partitionedBy(days(ts))``);
in environments without the Iceberg runtime (this sandbox) the same
layout is written as parquet partitioned by ``part_date`` with dynamic
partition overwrite — the sink interface is identical either way.

Checkpoint/resume contract (north_rule):
- work is chunked at partition granularity (one calendar day of ``ts``);
- a ledger table records completed partitions + per-partition lineage
  and metrics (row counts, keep counts, wall time, input fingerprint);
- a resumed run anti-joins pending partitions against the ledger and
  reprocesses ONLY those; outputs are deterministic per partition and
  written with dynamic partition overwrite, so re-running a partition
  (after a mid-write crash) is idempotent;
- no row-granular state anywhere.
"""

from __future__ import annotations

import json
import logging
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .observability import attach_quality_observation
from .quality import (
    combine_rule_partials,
    interval_rule_partials,
    run_quality_pipeline,
)
from .rules import RULE_NAMES, Thresholds

log = logging.getLogger(__name__)

OUTPUT_COLUMNS = ["conv_id", "turn_idx", "role", "tool", "ts", "keep",
                  *RULE_NAMES, "text_scrubbed"]

# footer reads go driver-side below this many files, RDD-distributed above
_FOOTER_DRIVER_MAX_FILES = 64

# contiguous-range discovery caps out here (≈27 years of daily partitions);
# beyond it one outlier timestamp is the likely cause → exact distinct scan
_MAX_DISCOVERY_DATES = 10_000

# at most this many zero-ledgered dates are re-checked for late data per
# run (most recent first) — bounds the OR predicate and the recheck scan
_MAX_RECHECK_DATES = 128


def _footer_minmax_one(path: str, col: str):
    """(min, max) of ``col`` from one parquet file's footer statistics.
    Returns None when stats are absent for any row group (must widen to a
    scan — a partial answer would silently drop partitions)."""
    import pyarrow.parquet as pq

    local = path[7:] if path.startswith("file://") else path
    md = pq.ParquetFile(local).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    if col not in names:
        return None
    ci = names[col]
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return (lo, hi)


def _parquet_footer_ts_bounds(df: DataFrame, col: str):
    """Global (min, max) of ``col`` from parquet footers, or None when the
    input is not footer-readable (non-parquet / no files / missing stats)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or not all(f.split("?")[0].endswith(".parquet") or "/part-" in f
                            for f in files):
        return None
    try:
        if len(files) <= _FOOTER_DRIVER_MAX_FILES:
            results = [_footer_minmax_one(f, col) for f in files]
        else:
            sc = df.sparkSession.sparkContext
            n_slices = max(1, len(files) // 256)
            results = (
                sc.parallelize(files, n_slices)
                .map(lambda f: _footer_minmax_one(f, col))
                .collect()
            )
    except Exception:
        return None
    if any(r is None for r in results) or not results:
        return None
    lo = min(r[0] for r in results)
    hi = max(r[1] for r in results)
    import datetime as _dt

    if not isinstance(lo, _dt.datetime):
        return None
    return (lo, hi)


def _footer_null_count_one(path: str, col: str):
    """Total null count of ``col`` from one file's footer, or None when
    any row group lacks the statistic."""
    import pyarrow.parquet as pq

    local = path[7:] if path.startswith("file://") else path
    md = pq.ParquetFile(local).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    if col not in names:
        return None
    total = 0
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(names[col]).statistics
        if st is None or st.null_count is None:
            return None
        total += st.null_count
    return total


def _is_bare_scan(df: DataFrame) -> bool:
    """True when ``df`` is a plain source relation (no filters/unions/
    projections), i.e. footer statistics describe exactly its rows.
    ``inputFiles()`` works THROUGH transformations, so footer-derived
    counts are only trustworthy for a bare scan."""
    try:
        name = df._jdf.queryExecution().analyzed().getClass().getSimpleName()
    except Exception:
        return False
    return name in ("LogicalRelation", "DataSourceV2Relation",
                    "DataSourceV2ScanRelation")


def _parquet_footer_null_count(df: DataFrame, col: str):
    """Global null count of ``col`` from parquet footers (zero data pages),
    or None when the input is not footer-readable or not a bare scan."""
    if not _is_bare_scan(df):
        return None
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or not all(f.split("?")[0].endswith(".parquet") or "/part-" in f
                            for f in files):
        return None
    try:
        if len(files) <= _FOOTER_DRIVER_MAX_FILES:
            results = [_footer_null_count_one(f, col) for f in files]
        else:
            sc = df.sparkSession.sparkContext
            results = (
                sc.parallelize(files, max(1, len(files) // 256))
                .map(lambda f: _footer_null_count_one(f, col))
                .collect()
            )
    except Exception:
        return None
    if any(r is None for r in results) or not results:
        return None
    return int(sum(results))


class QualitySink:
    """Filesystem-layout sink: ``<root>/turns`` (partitioned parquet),
    ``<root>/stats`` (per-interval rule stats), ``<root>/ledger``
    (completed-partition manifest + metrics, one JSON file per partition)."""

    def __init__(self, root: str):
        self.root = root
        self.turns_dir = os.path.join(root, "turns")
        self.stats_dir = os.path.join(root, "stats")
        self.stats_partials_dir = os.path.join(root, "stats_partials")
        self.ledger_dir = os.path.join(root, "ledger")

    def _partials_dir(self, time_interval: str) -> str:
        """Partials tree for one bucket granularity — intervals never mix."""
        return os.path.join(self.stats_partials_dir, time_interval)

    def _sync_partials(
        self, spark: SparkSession, time_interval: str, nonzero_done: set[str]
    ) -> bool:
        """Backfill this granularity's partials tree for partitions that
        were completed (with rows) under a DIFFERENT time_interval — a
        one-time scan bounded to exactly those partitions. Returns True
        when anything was backfilled. Zero-row completions are excluded:
        they have no turns to aggregate and would otherwise trigger a
        no-op backfill job on every run forever."""
        pdir = self._partials_dir(time_interval)
        missing = sorted(nonzero_done - self._partial_dates(pdir))
        if not missing:
            return False
        # dynamic overwrite is load-bearing here too: with the default
        # static mode this write would wipe the whole partials tree and
        # keep only the backfilled dates (the early-return path reaches
        # this before run()'s own conf set)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        backfill = interval_rule_partials(
            self.read_turns(spark).filter(
                F.col("part_date").isin(missing)
            ),
            time_interval,
        )
        backfill.repartition("part_date").write.mode("overwrite").partitionBy(
            "part_date"
        ).parquet(pdir)
        return True

    @staticmethod
    def _partial_dates(pdir: str) -> set[str]:
        """part_dates already present in a partials tree (filesystem
        listing; on object stores / Iceberg this is the catalog's
        partition metadata)."""
        if not os.path.isdir(pdir):
            return set()
        return {
            d.split("=", 1)[1]
            for d in os.listdir(pdir)
            if d.startswith("part_date=")
        }

    # -- ledger ------------------------------------------------------------
    def ledger_entries(self) -> dict[str, dict]:
        """part_date → ledger entry for every completed partition."""
        if not os.path.isdir(self.ledger_dir):
            return {}
        entries: dict[str, dict] = {}
        for f in os.listdir(self.ledger_dir):
            if f.endswith(".json"):
                with open(os.path.join(self.ledger_dir, f)) as fh:
                    e = json.load(fh)
                entries[e["part_date"]] = e
        return entries

    def completed_partitions(self) -> set[str]:
        return set(self.ledger_entries())

    def _write_ledger_entry(self, entry: dict) -> None:
        os.makedirs(self.ledger_dir, exist_ok=True)
        # write-then-rename so a crash mid-write never yields a valid entry
        path = os.path.join(self.ledger_dir, f"{entry['part_date']}.json")
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        os.replace(tmp, path)

    # -- partition discovery -------------------------------------------------
    @staticmethod
    def discover_partitions(df: DataFrame) -> list[str]:
        """Candidate partition dates WITHOUT a full input scan.

        A ``distinct()`` over the raw fact table is a complete scan plus a
        shuffle before any work starts; at 10^12 rows that alone dominates
        an incremental run. Discovery is tiered, cheapest first:

        1. **Footer statistics** — for a parquet-backed input, read the
           per-row-group min/max of ``ts`` straight from the file footers
           (the bare-parquet analog of Iceberg manifest metadata; on
           Iceberg the catalog serves the same numbers). Footer reads are
           O(#files) metadata I/O, distributed over an RDD of file names
           when the listing is large — zero data pages touched.
        2. **Fallback** — ``min(ts)/max(ts)`` aggregation: a single-column
           pruned scan with map-side partial aggregation and no shuffle.

        The contiguous [min_date, max_date] range is the candidate set; a
        date inside the range with no rows is processed as empty but NOT
        ledgered, so late-arriving data for it is still picked up by a
        later run. If the range spans more than ``_MAX_DISCOVERY_DATES``
        (one corrupt epoch-0 or far-future timestamp would otherwise
        explode the candidate set), discovery falls back to the exact
        distinct-date scan — correctness over cheapness for dirty input.

        Timezone note: dates are derived via ``to_date(ts)`` IN SPARK
        (session timezone, UTC) — never via driver-side ``.date()`` on a
        collected naive timestamp, which PySpark renders in the driver
        OS timezone and can shift boundary partitions on non-UTC hosts.
        """
        import datetime as _dt

        bounds = _parquet_footer_ts_bounds(df, "ts")
        if bounds is None:
            row = df.agg(
                F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
            ).first()
            if row is None or row["lo"] is None:
                return []
            lo, hi = row["lo"], row["hi"]
        else:
            # footer stats are tz-aware UTC — consistent with session UTC
            lo, hi = bounds[0].date(), bounds[1].date()
        n_dates = (hi - lo).days + 1
        if n_dates > _MAX_DISCOVERY_DATES:
            return [
                str(r[0])
                for r in df.where(F.col("ts").isNotNull())
                .select(F.to_date("ts").alias("d"))
                .distinct()
                .orderBy("d")
                .collect()
            ]
        return [str(lo + _dt.timedelta(days=i)) for i in range(n_dates)]

    # -- main entry ----------------------------------------------------------
    def run(
        self,
        df: DataFrame,
        thresholds: Thresholds = Thresholds(),
        time_interval: str = "1d",
        batch_days: int | None = None,
    ) -> dict:
        """Process all pending partitions; returns a run summary.

        ``batch_days`` limits how many pending partitions are processed
        (for incremental/checkpoint-test runs); None = all pending.
        """
        spark = df.sparkSession
        all_parts = self.discover_partitions(df)
        # rows without an event time have no partition and would silently
        # vanish from the output — surface the drop. For a bare parquet
        # scan (the 10^12-row production shape) footer null_count answers
        # with zero data I/O; transformed or non-parquet inputs pay one
        # ts-pruned count scan so the summary is always a real number.
        n_null_ts = _parquet_footer_null_count(df, "ts")
        if n_null_ts is None:
            n_null_ts = df.filter(F.col("ts").isNull()).count()
        if n_null_ts:
            log.warning(
                "%d input rows have NULL ts and are excluded from every "
                "partition (reported as n_null_ts in the run summary)",
                n_null_ts,
            )
        df = df.withColumn("part_date", F.to_date("ts"))
        entries = self.ledger_entries()
        done = set(entries)
        nonzero_done = {d for d, e in entries.items() if e.get("n_turns", 0) > 0}
        pending = [p for p in all_parts if p not in done]
        # zero-ledgered dates (empty when first seen) are re-checked with
        # ts-range predicates — pushable to the scan, so row groups outside
        # those dates are pruned and the cost is only late-arriving rows.
        # Bounded: only the most recent _MAX_RECHECK_DATES are re-checked
        # each run (late data overwhelmingly lands near the present;
        # ancient always-empty dates would otherwise accrete an unbounded
        # OR predicate and a scan job on every no-op resume forever).
        zero_dates = sorted(done - nonzero_done)[-_MAX_RECHECK_DATES:]
        if zero_dates:
            import datetime as _dt

            cond = None
            for d in zero_dates:
                d0 = _dt.date.fromisoformat(d)
                c = (F.col("ts") >= F.lit(d0)) & (
                    F.col("ts") < F.lit(d0 + _dt.timedelta(days=1))
                )
                cond = c if cond is None else (cond | c)
            refreshed = [
                str(r[0])
                for r in df.filter(cond).select("part_date").distinct().collect()
            ]
            pending = sorted(set(pending) | set(refreshed))
        if batch_days is not None:
            pending = pending[:batch_days]
        if not pending:
            # still honor an interval switch: backfill this granularity's
            # partials from completed partitions before returning
            if self._sync_partials(spark, time_interval, nonzero_done):
                stats = combine_rule_partials(
                    spark.read.parquet(self._partials_dir(time_interval))
                )
                self._write_stats(stats)
            return {"processed_partitions": 0, "skipped_partitions": len(done),
                    "n_turns": 0, "n_keep": 0, "n_null_ts": n_null_ts}

        t0 = time.perf_counter()
        subset = df.filter(F.col("part_date").isin(pending))
        # engage every core on the UDF stage even when the input is a
        # handful of files (at production scale the scan already has
        # thousands of splits and this is a no-op); 4 waves per core so
        # per-task cost skew (huge blob turns) can't set the wall clock
        parallelism = spark.sparkContext.defaultParallelism * 4
        if subset.rdd.getNumPartitions() < parallelism:
            subset = subset.repartition(parallelism)
        result = run_quality_pipeline(subset, thresholds)
        out = result.select(
            *OUTPUT_COLUMNS,
            # materialized so stats/ledger aggregations read a 4-byte
            # column instead of re-scanning the scrubbed text bytes
            F.length("text_scrubbed").alias("n_chars_scrubbed"),
            "part_date",
        )

        # one pass writes the combined per-turn artifact (labels + scrub);
        # dynamic partition overwrite keeps partition re-runs idempotent.
        # repartition by part_date so each date directory gets one writer
        # (no small-files explosion: tasks × dates files otherwise).
        # Drop-reason telemetry rides this same write action as observed
        # metrics — per-rule failure counts at 100 TB without a second
        # pass over the input (pipeline/observability.py).
        out, run_obs = attach_quality_observation(out, name=f"sink_run_{uuid.uuid4().hex[:8]}")
        self._write_turns(out.repartition("part_date"))
        observed = run_obs.get

        # stats + per-partition metrics from the WRITTEN output (cheap,
        # column-pruned re-read of compact parquet, never the raw input).
        # Incremental: only THIS batch's partitions are aggregated into
        # combinable partials (counts + flag sums per (part_date, bucket)),
        # written with dynamic overwrite so a partition re-run is
        # idempotent. The combined stats artifact is then derived from the
        # partials alone — O(#partitions × #buckets) rows, never a re-read
        # of the accumulated table — and still converges to exactly what an
        # uninterrupted run would produce.
        all_written = self.read_turns(spark)
        written = all_written.filter(F.col("part_date").isin(pending))
        pdir = self._partials_dir(time_interval)
        partials = interval_rule_partials(written, time_interval)
        # dynamic overwrite is load-bearing for the partials tree on its
        # own (static mode would wipe every previously-completed date on
        # resume) — set here, not only inside _write_turns, because an
        # Iceberg-committed turns artifact doesn't touch this conf
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        partials.repartition("part_date").write.mode("overwrite").partitionBy(
            "part_date"
        ).parquet(pdir)
        # partials are keyed by bucket granularity: a run with a NEW
        # time_interval starts a fresh partials tree, and partitions
        # completed under a different interval are backfilled ONCE (a scan
        # bounded to those partitions) instead of silently mixing
        # granularities in one artifact
        self._sync_partials(spark, time_interval, nonzero_done)
        stats = combine_rule_partials(spark.read.parquet(pdir))
        self._write_stats(stats)
        # ledger metrics: counts and scrubbed-char sums come from the
        # partials just written (metadata-sized — #dates × #buckets rows,
        # never the fact table); only the exact distinct-conversation
        # count needs the written table, and that scan reads two narrow
        # dictionary-encoded columns, not the text. mergeSchema guards a
        # partials tree that predates the scrubbed_chars_sum column.
        date_sums = {
            str(r["part_date"]): r
            for r in (
                spark.read.option("mergeSchema", "true")
                .parquet(pdir)
                .filter(F.col("part_date").isin(pending))
                .groupBy("part_date")
                .agg(
                    F.sum("n_turns").alias("n_turns"),
                    F.sum("keep_sum").alias("n_keep"),
                    F.sum("scrubbed_chars_sum").alias("scrubbed_chars"),
                )
                .collect()
            )
        }
        conv_counts = {
            str(r["part_date"]): r["n_convs"]
            for r in (
                written.groupBy("part_date")
                .agg(F.countDistinct("conv_id").alias("n_convs"))
                .collect()
            )
        }
        metrics = [
            {
                "part_date": d,
                "n_turns": row["n_turns"],
                "n_keep": row["n_keep"],
                "scrubbed_chars": row["scrubbed_chars"] or 0,
                "n_convs": conv_counts.get(d, 0),
            }
            for d, row in date_sums.items()
        ]
        wall = time.perf_counter() - t0
        total_turns = 0
        total_keep = 0
        # EVERY selected pending date is ledgered — empty ones with zeros —
        # so a batch_days-limited run always makes progress (an un-ledgered
        # empty date would be re-selected forever). Zero entries are
        # re-checked cheaply at the top of each run and reprocessed when
        # their data arrives late, so backfill still works.
        by_date = {str(row["part_date"]): row for row in metrics}
        batch_entries: list[dict] = []
        for part in pending:
            row = by_date.get(part)
            entry = {
                "part_date": part,
                "n_turns": row["n_turns"] if row else 0,
                "n_keep": row["n_keep"] if row else 0,
                "n_convs": row["n_convs"] if row else 0,
                "scrubbed_chars": row["scrubbed_chars"] if row else 0,
                "run_wall_sec": round(wall, 3),
                "thresholds": thresholds.__dict__ | {
                    "allowed_langs": list(thresholds.allowed_langs)
                },
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            self._write_ledger_entry(entry)
            batch_entries.append(entry)
            total_turns += entry["n_turns"]
            total_keep += entry["n_keep"]
        self._write_lineage(spark, batch_entries)

        return {
            "processed_partitions": len(pending),
            "skipped_partitions": len(done),
            "n_turns": total_turns,
            "n_keep": total_keep,
            "n_null_ts": n_null_ts,
            "wall_sec": round(wall, 3),
            # drop-reason attribution for THIS batch, observed on the
            # write action itself (not derivable from the ledger, which
            # folds per-date totals only)
            # sum() observes NULL on an all-empty batch (late-date recheck
            # runs where every pending date turned out empty) — report 0
            "rule_failures": {
                r: int(observed.get(f"fail_{r}") or 0) for r in RULE_NAMES
            },
        }

    def _write_turns(self, out: DataFrame) -> None:
        """Commit one batch of partitions to the turns artifact.
        Partition re-runs must be idempotent (dynamic overwrite)."""
        spark = out.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        out.write.mode("overwrite").partitionBy("part_date").parquet(
            self.turns_dir
        )

    def _write_stats(self, stats: DataFrame) -> None:
        """Publish the combined interval-stats artifact (full refresh —
        it is metadata-sized: #buckets × #rule columns)."""
        stats.write.mode("overwrite").parquet(self.stats_dir)

    def _write_lineage(self, spark: SparkSession, entries: list[dict]) -> None:
        """Hook for a queryable lineage artifact; the per-date JSON
        ledger written above is the base sink's (driver-local) record."""

    def read_turns(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.turns_dir)

    def read_stats(self, spark: SparkSession, time_interval: str = "1d") -> DataFrame:
        """Combined interval stats at one granularity, folded from the
        per-partition partials (equivalent to interval_rule_stats over the
        whole written table, without scanning it)."""
        return combine_rule_partials(
            spark.read.parquet(self._partials_dir(time_interval))
        )


class IcebergQualitySink(QualitySink):
    """QualitySink whose per-turn fact table is a REAL Iceberg v2 table
    (north_rule: "writes keep/drop flags … to Iceberg"), committed via
    the jar-less metadata writer (:mod:`..sources.iceberg_lite`) with
    dynamic partition overwrite: each batch's ``part_date`` partitions
    replace their prior files in a new snapshot, untouched partitions
    carry forward, so a partition re-run after a mid-write crash is
    idempotent AND every batch is a time-travelable snapshot (the
    audit/rollback story the plain hive layout can't give). On a real
    cluster the same class runs against the Iceberg runtime jar by
    swapping the two methods below for ``writeTo().overwritePartitions()``
    / ``spark.read.format("iceberg")`` — the run()/ledger/stats logic is
    identical.

    The stats partials + combined stats stay partitioned parquet: they
    are metadata-sized derived artifacts (#dates × #buckets rows), not
    the 10^12-row fact table.

    Scale note: ``read_iceberg`` plans one scan per live partition value
    and unions them — fine for the per-batch stats re-read here (bounded
    by the batch's date count); a whole-table analytical read at
    production scale goes through the runtime jar's single scan node.
    """

    def _write_turns(self, out: DataFrame) -> None:
        from ..sources.iceberg_lite import write_iceberg as _wi

        self._last_turns_snapshot = _wi(
            out, self.turns_dir, partition_by=["part_date"],
            mode="overwrite_partitions",
        )

    def read_turns(self, spark: SparkSession) -> DataFrame:
        from ..sources.iceberg_lite import read_iceberg as _ri

        return _ri(spark, self.turns_dir)

    def _write_stats(self, stats: DataFrame) -> None:
        """The combined interval stats are an Iceberg table too (north
        rule: "writes ... per-rule quality statistics aggregated by
        groupBy over time intervals ... to Iceberg"): full-refresh
        overwrite per batch, so every batch's stats state is a
        time-travelable snapshot."""
        from ..sources.iceberg_lite import write_iceberg as _wi

        _wi(stats, self.stats_dir, partition_by=[], mode="overwrite")

    def _write_lineage(self, spark: SparkSession, entries: list[dict]) -> None:
        """Per-partition lineage + metrics as an append-only Iceberg
        table at ``<root>/lineage`` — one appended snapshot per batch.
        Each row links a completed ``part_date`` to the exact turns-table
        snapshot that committed it (``turns_snapshot_id``), so an auditor
        can time-travel the fact table to the state any metric row
        describes. The JSON ledger stays the driver-local resume index;
        this table is the queryable record."""
        if not entries:
            return
        import json as _json

        from ..sources.iceberg_lite import write_iceberg as _wi

        snap = getattr(self, "_last_turns_snapshot", None)
        rows = [
            (
                e["part_date"],
                int(e["n_turns"]),
                int(e["n_keep"]),
                int(e["n_convs"]),
                int(e["scrubbed_chars"]),
                float(e["run_wall_sec"]),
                _json.dumps(e["thresholds"], sort_keys=True),
                e["completed_at"],
                snap,
            )
            for e in entries
        ]
        df = spark.createDataFrame(
            rows,
            "part_date string, n_turns long, n_keep long, n_convs long, "
            "scrubbed_chars long, run_wall_sec double, thresholds string, "
            "completed_at string, turns_snapshot_id long",
        )
        _wi(df.coalesce(1), self.lineage_dir, partition_by=[], mode="append")

    @property
    def lineage_dir(self) -> str:
        return os.path.join(self.root, "lineage")

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        from ..sources.iceberg_lite import read_iceberg as _ri

        return _ri(spark, self.lineage_dir)

    def read_stats_table(self, spark: SparkSession) -> DataFrame:
        """The published stats artifact (vs ``read_stats``, which folds
        partials on the fly)."""
        from ..sources.iceberg_lite import read_iceberg as _ri

        return _ri(spark, self.stats_dir)

    def maintain(
        self,
        keep_last_snapshots: int = 7,
        orphans_older_than_ms: int | None = 3 * 86_400 * 1000,
        dry_run: bool = False,
    ) -> dict:
        """Table maintenance across all three Iceberg tables: expire old
        snapshots (reclaiming the data files each day's dynamic partition
        overwrite replaced — without this a daily pipeline's storage
        grows with history, not with data) and sweep orphans left by
        aborted writes. Returns per-table summaries. Run it after the
        batch cadence (e.g. weekly with ``keep_last_snapshots=7`` to keep
        a week of time travel)."""
        from ..sources.iceberg_lite import expire_snapshots, remove_orphan_files

        out: dict = {}
        for name, loc in (
            ("turns", self.turns_dir),
            ("stats", self.stats_dir),
            ("lineage", self.lineage_dir),
        ):
            try:
                expired = expire_snapshots(
                    loc, keep_last=keep_last_snapshots, dry_run=dry_run
                )
                swept = remove_orphan_files(
                    loc, older_than_ms=orphans_older_than_ms, dry_run=dry_run
                )
            except FileNotFoundError:
                continue  # table not created yet (no batch ran)
            out[name] = {**expired, "orphans_removed": swept["orphans_removed"]}
        return out


def write_iceberg(result: DataFrame, table: str) -> None:
    """Iceberg sink (requires the iceberg-spark runtime on the cluster):
    partitioned by days(ts), append-or-replace semantics handled by the
    caller via ``overwritePartitions``. Kept behind this function so the
    sandbox (no Iceberg jar) uses the parquet layout above instead."""
    from pyspark.sql.functions import partitioning

    result.writeTo(table).partitionedBy(partitioning.days(F.col("ts"))).createOrReplace()
