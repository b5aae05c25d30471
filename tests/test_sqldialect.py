from __future__ import annotations

from data_quality_automated_evaluator_spark.functions.sqldialect import (
    rewrite_pg_casts,
    strptime_to_jdk,
    to_spark_sql,
)


def test_strptime_to_jdk():
    assert strptime_to_jdk("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert strptime_to_jdk("%m/%d/%Y %H:%M") == "MM/dd/yyyy HH:mm"
    assert strptime_to_jdk("%d %b %Y") == "dd MMM yyyy"


def test_pg_cast_ident():
    assert rewrite_pg_casts("acct_num::text") == "CAST(acct_num AS string)"
    assert rewrite_pg_casts("timestamp::date") == "CAST(timestamp AS date)"


def test_pg_cast_paren():
    assert (
        rewrite_pg_casts("(anomaly = 'high_risk')::int")
        == "CAST((anomaly = 'high_risk') AS int)"
    )


def test_pg_cast_literal_and_nested():
    assert rewrite_pg_casts("'2023-01-01'::date") == "CAST('2023-01-01' AS date)"
    assert (
        rewrite_pg_casts("a::int + b::int")
        == "CAST(a AS int) + CAST(b AS int)"
    )


def test_date_fn():
    assert (
        to_spark_sql("DATE(Time_step, '%m/%d/%Y %H:%M')")
        == "to_date(Time_step, 'MM/dd/yyyy HH:mm')"
    )
    assert (
        to_spark_sql("DATETIME(ts, '%Y-%m-%d %H:%M:%S')")
        == "to_timestamp(ts, 'yyyy-MM-dd HH:mm:ss')"
    )


def test_full_filter_statement():
    sql = "select * from self where timestamp::date > '2023-01-01' and step > 1"
    out = to_spark_sql(sql)
    assert "CAST(timestamp AS date)" in out


def test_spark_execution(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("high_risk", "2023-05-01 10:00:00"), ("low_risk", "2023-05-02 11:30:00")],
        "anomaly string, ts string",
    )
    out = df.select(
        F.expr(to_spark_sql("(anomaly = 'high_risk')::int")).alias("t"),
        F.expr(to_spark_sql("DATE(ts, '%Y-%m-%d %H:%M:%S')")).alias("d"),
    ).collect()
    assert [r["t"] for r in out] == [1, 0]
    assert str(out[0]["d"]) == "2023-05-01"
