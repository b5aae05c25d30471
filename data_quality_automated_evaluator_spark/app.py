"""Config-driven CLI: ``python -m data_quality_automated_evaluator_spark.app config.json``.

Reference lifecycle parity (main.py:9-44): load config → read source →
preprocess (filter → transforms → interval bucketing → stage-1 agg) →
collect → stage-2 evaluation → markdown report.

Error-handling parity (handle_exceptions.py semantics, SURVEY §2.11):
read + preprocess failures are fatal (exit 1); evaluation/report
failures degrade to a logged warning with an explicit None result —
never the reference's surprising args[0] echo.

Also the spark-submit entry point: packaged via ``--py-files`` (see
``make_pyfiles_zip``), this module is the driver program for both the
evaluator and the transcripts quality pipeline (``--quality-filter``).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

from pyspark.sql import SparkSession

log = logging.getLogger("data_quality_automated_evaluator_spark")


def run_evaluator(spark: SparkSession, config: dict) -> str | None:
    # reference scale knob parity (preprocess.py:65-66): chunk size maps
    # to the Arrow batch size of the collect path. The override is scoped
    # to this run — the session is shared, so the prior value is restored.
    _ARROW_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prior_batch = None
    if "streaming_chunk_size" in config:
        try:
            prior_batch = spark.conf.get(_ARROW_KEY)
        except Exception:
            prior_batch = None
        spark.conf.set(_ARROW_KEY, str(int(config["streaming_chunk_size"])))
    try:
        return _run_evaluator_inner(spark, config)
    finally:
        if "streaming_chunk_size" in config:
            if prior_batch is None:
                spark.conf.unset(_ARROW_KEY)
            else:
                spark.conf.set(_ARROW_KEY, prior_batch)


def _run_evaluator_inner(spark: SparkSession, config: dict) -> str | None:
    from .operators.preprocess import make_preprocessing
    from .report import make_report
    from .sources.readers import read_source

    df = read_source(spark, config["source"])  # fatal on error
    res = make_preprocessing(df, config)  # fatal on error

    agg = res.aggregate.toPandas()  # tiny: one row per interval
    try:
        # reference path convention: <output>/<markdown.name> (report.py:288)
        default_out = "report/REPORT.md"
        if "output" in config:
            default_out = os.path.join(
                str(config["output"]),
                (config.get("markdown") or {}).get("name", "README.md"),
            )
        out = config.get("report_path", default_out)
        make_report(agg, res.metadata, config, output_path=out)
        return out
    except Exception:
        log.exception("report generation failed (non-fatal)")
        return None


def run_quality_filter(spark: SparkSession, config: dict) -> dict:
    from .pipeline.rules import Thresholds
    from .pipeline.sinks import IcebergQualitySink, QualitySink
    from .sources.readers import read_source

    df = read_source(spark, config["source"])
    thresholds = Thresholds(**config.get("thresholds", {}))
    # "sink_format": "iceberg" commits turns/stats/lineage as Iceberg
    # tables (snapshots + time travel); default stays partitioned parquet
    sink_format = str(config.get("sink_format", "parquet")).lower()
    if sink_format == "iceberg":
        sink: QualitySink = IcebergQualitySink(config["output_root"])
    elif sink_format == "parquet":
        sink = QualitySink(config["output_root"])
    else:
        raise ValueError(f"unknown sink_format {sink_format!r}")
    return sink.run(
        df,
        thresholds=thresholds,
        time_interval=config.get("time_interval", "1d"),
        batch_days=config.get("batch_days"),
    )


def make_pyfiles_zip(out_path: str = "data_quality_automated_evaluator_spark.zip") -> str:
    """Package this library for ``spark-submit --py-files``."""
    import os
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("config", help="path to JSON config")
    parser.add_argument("--quality-filter", action="store_true",
                        help="run the transcripts quality pipeline instead of the evaluator")
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    with open(args.config) as fh:
        config = json.load(fh)

    from .session import get_spark

    spark = get_spark(app_name="data_quality_automated_evaluator_spark", master=args.master)
    try:
        if args.quality_filter:
            summary = run_quality_filter(spark, config)
            print(json.dumps(summary))
        else:
            out = run_evaluator(spark, config)
            print(out or "")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
