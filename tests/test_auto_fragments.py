"""Schema-driven document encoder dispatch (MySQL/SQLite/Mongo styles)."""

import json

from pyspark.sql import functions as F

from database_replicator_spark.operators.documents import auto_fragments


def _doc(spark, df, style):
    out = df.select(auto_fragments(df, style=style).alias("j")).collect()[0]["j"]
    return json.loads(out)


def test_mysql_style(spark):
    df = spark.createDataFrame(
        [(1, 2.5, True, b"h\xc3\xa9", "2024-03-05 10:20:30", "s")],
        "i long, f double, b boolean, raw binary, ts string, s string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    doc = _doc(spark, df, "mysql")
    assert doc["i"] == 1 and doc["f"] == 2.5 and doc["b"] is True
    assert doc["raw"] == "hé"  # valid utf-8 bytes → plain string
    assert doc["ts"] == {"_type": "datetime", "value": "2024-03-05T10:20:30.000000Z"}
    assert doc["s"] == "s"


def test_sqlite_style_blob(spark):
    df = spark.createDataFrame([(b"\x01\x02",)], "raw binary")
    doc = _doc(spark, df, "sqlite")
    assert doc["raw"] == {"_type": "blob", "data": "AQI="}


def test_mongo_style_datetime_and_decimal(spark):
    from decimal import Decimal

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", Decimal("1.2345"))],
        "ts string, d decimal(10,4)",
    )
    df = df.selectExpr("cast(ts as timestamp) ts", "d")
    doc = _doc(spark, df, "mongo")
    assert doc["ts"] == {"_type": "datetime", "$date": 1704067200000}
    assert doc["d"] == "1.2345"  # precision-preserving string


def test_nonfinite_real_rule(spark):
    df = spark.createDataFrame([(float("nan"), float("-inf"))], "a double, b double")
    doc = _doc(spark, df, "mysql")
    assert doc["a"] == "NaN" and doc["b"] == "-inf"
