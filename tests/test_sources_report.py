from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from data_quality_automated_evaluator_spark.sources.readers import (
    handle_environment_variables,
    handle_schema_overrides,
    read_source,
    _jdbc_url,
)


def test_env_substitution(monkeypatch):
    monkeypatch.setenv("MY_KEY", "sekret")
    out = handle_environment_variables(
        {"uri": "$MY_KEY", "nested": {"token": "$MY_KEY"}, "plain": "x", "n": 3}
    )
    assert out["uri"] == "sekret"
    assert out["nested"]["token"] == "sekret"
    assert out["plain"] == "x" and out["n"] == 3
    with pytest.raises(KeyError):
        handle_environment_variables({"uri": "$NOPE_NOT_SET"})


def test_schema_overrides_mapping():
    from pyspark.sql import types as T

    m = handle_schema_overrides(
        {"a": "String", "b": "Date", "c": "Datetime", "d": "Categorical", "e": "Nope"}
    )
    assert m["a"] == T.StringType()
    assert m["b"] == T.DateType()
    assert m["c"] == T.TimestampType()
    assert m["d"] == T.StringType()
    assert "e" not in m  # warn + skip


def test_jdbc_url():
    assert (
        _jdbc_url("postgresql://u:p@host:5432/db")
        == "jdbc:postgresql://host:5432/db?user=u&password=p"
    )
    assert _jdbc_url("jdbc:postgresql://h/db") == "jdbc:postgresql://h/db"


def test_read_source_dispatch(spark, sf_dir, tmp_path):
    df = read_source(spark, {"path": f"{sf_dir}/events.parquet"})
    assert df.count() > 0
    # csv with overrides
    csv = tmp_path / "t.csv"
    csv.write_text("a,b,d\n1,x,2023-01-01\n2,y,2023-01-02\n")
    df = read_source(
        spark,
        {"path": str(csv), "schema_overrides": {"a": "String", "d": "Date"}},
    )
    assert dict(df.dtypes)["a"] == "string"
    assert dict(df.dtypes)["d"] == "date"
    with pytest.raises(ValueError, match="unsupported file format"):
        read_source(spark, {"path": "x.xyz"})


def test_report_and_cli(spark, sf_dir, tmp_path):
    """Drive the reference-shaped lifecycle end-to-end through the CLI."""
    config = {
        "source": {"path": f"{sf_dir}/events.parquet"},
        "date_column": "ts",
        "time_interval": "1d",
        "target_column": "value",
        "columns_to_exclude": ["props"],
        "report_path": str(tmp_path / "out" / "REPORT.md"),
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "data_quality_automated_evaluator_spark.app", str(cfg_path),
         "--master", "local[4]"],
        capture_output=True, text=True, cwd=repo, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = (tmp_path / "out" / "REPORT.md").read_text()
    assert "# Data quality evaluation" in report
    assert "## Column `value`" in report
    assert "Numeric statistics" in report
    assert "Mean ± Std" in report
    assert "## Contents" in report


def test_pyfiles_zip(tmp_path):
    from data_quality_automated_evaluator_spark.app import make_pyfiles_zip
    import zipfile

    out = make_pyfiles_zip(str(tmp_path / "pkg.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "data_quality_automated_evaluator_spark/app.py" in names
    assert "data_quality_automated_evaluator_spark/pipeline/quality.py" in names
    assert not any("__pycache__" in n for n in names)
