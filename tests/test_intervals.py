from __future__ import annotations

import datetime as dt

import pytest

from data_quality_automated_evaluator_spark.functions.intervals import parse_interval, truncate_to_interval


def test_parse_simple():
    assert parse_interval("1d") == ("seconds", 86400.0)
    assert parse_interval("1h") == ("seconds", 3600.0)
    assert parse_interval("13h") == ("seconds", 13 * 3600.0)
    assert parse_interval("90m") == ("seconds", 5400.0)
    assert parse_interval("1w") == ("seconds", 604800.0)


def test_parse_composite():
    assert parse_interval("1d1h") == ("seconds", 90000.0)
    assert parse_interval("2d12h30m") == ("seconds", 2 * 86400.0 + 12 * 3600 + 1800)


def test_parse_calendar():
    assert parse_interval("1mo") == ("calendar", "month")
    assert parse_interval("1q") == ("calendar", "quarter")
    assert parse_interval("1y") == ("calendar", "year")


def test_parse_errors():
    for bad in ["", "d1", "1x", "1mo1h", "2mo", "0s"]:
        with pytest.raises(ValueError):
            parse_interval(bad)


def test_truncate_semantics(spark):
    import pyspark.sql.functions as F

    rows = [
        (dt.datetime(2025, 3, 1, 13, 45, 17),),
        (dt.datetime(2025, 3, 2, 0, 0, 0),),
        (dt.datetime(2025, 3, 2, 23, 59, 59),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    day = [r[0] for r in df.select(truncate_to_interval(F.col("ts"), "1d")).collect()]
    assert day == [
        dt.datetime(2025, 3, 1),
        dt.datetime(2025, 3, 2),
        dt.datetime(2025, 3, 2),
    ]
    # epoch-aligned 25h buckets
    h25 = [r[0] for r in df.select(truncate_to_interval(F.col("ts"), "1d1h")).collect()]
    for orig, trunc in zip([r[0] for r in rows], h25):
        epoch = dt.datetime(1970, 1, 1)
        secs = (orig - epoch).total_seconds()
        expect = epoch + dt.timedelta(seconds=(secs // 90000) * 90000)
        assert trunc == expect
    # calendar month
    mo = [r[0] for r in df.select(truncate_to_interval(F.col("ts"), "1mo")).collect()]
    assert all(m == dt.datetime(2025, 3, 1) for m in mo)
