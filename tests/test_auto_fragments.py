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


def test_mysql_type_matrix(spark):
    """The 14-type matrix from reference tests/mysql_integration_test.rs:
    287-320, re-expressed over the schema-driven encoder: max/negative
    ints, unicode, empty strings, empty + non-utf8 blobs, epoch boundary,
    tinyint, NULL."""
    rows = [
        (1, 42, 9223372036854775807, 123.45, 2.71828, "Hello World",
         "2024-01-15 10:30:45", b"\xde\xad\xbe\xef", 1, None),
        (2, -100, -1000000, -50.25, -1.414, "Special chars: 日本語",
         "2023-12-01 00:00:00", b"", 0, None),
        (3, 0, 0, 0.0, 0.0, "",
         "1970-01-01 00:00:00", b"\x00\x01\x02\x03", 127, None),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, int_col int, bigint_col long, float_col double, "
        "double_col double, varchar_col string, datetime_col string, "
        "blob_col binary, tinyint_col byte, null_col string",
    ).withColumn("datetime_col", F.col("datetime_col").cast("timestamp"))
    docs = {d["id"]: d for d in
            (json.loads(r["j"]) for r in df.select(
                auto_fragments(df, style="mysql").alias("j")).collect())}

    d1 = docs[1]
    assert d1["bigint_col"] == 9223372036854775807  # i64::MAX survives
    assert d1["datetime_col"] == {"_type": "datetime",
                                  "value": "2024-01-15T10:30:45.000000Z"}
    # 0xDEADBEEF is not valid utf-8 → binary-tagged
    assert d1["blob_col"] == {"_type": "binary", "data": "3q2+7w=="}
    assert d1["tinyint_col"] == 1 and d1["null_col"] is None

    d2 = docs[2]
    assert d2["varchar_col"] == "Special chars: 日本語"  # unicode intact
    assert d2["blob_col"] == ""  # empty bytes are valid utf-8 → empty string

    d3 = docs[3]
    assert d3["varchar_col"] == "" and d3["int_col"] == 0
    assert d3["datetime_col"]["value"] == "1970-01-01T00:00:00.000000Z"
    # 0x00010203 decodes as utf-8 control chars → stays a (escaped) string
    assert d3["blob_col"] == "\x00\x01\x02\x03"
    assert d3["tinyint_col"] == 127


def test_mysql_precision_vectors(spark):
    """precision_test vectors (mysql_integration_test.rs:483-507):
    DECIMAL(20,10) exact digits and DATETIME(6) full microseconds."""
    from decimal import Decimal

    df = spark.createDataFrame(
        [
            (1, Decimal("123456789.0123456789"), "2024-01-15 10:30:45.123456"),
            (2, Decimal("-987654321.9876543210"), "2023-12-31 23:59:59.999999"),
        ],
        "id long, precise_decimal decimal(20,10), precise_datetime string",
    ).withColumn("precise_datetime", F.col("precise_datetime").cast("timestamp"))
    docs = {d["id"]: d for d in
            (json.loads(r["j"]) for r in df.select(
                auto_fragments(df, style="mysql").alias("j")).collect())}
    assert docs[1]["precise_decimal"] == 123456789.0123456789
    assert docs[1]["precise_datetime"]["value"] == "2024-01-15T10:30:45.123456Z"
    assert docs[2]["precise_datetime"]["value"] == "2023-12-31T23:59:59.999999Z"
    # decimal render keeps all 10 fractional digits (no float round-trip)
    raw = df.filter(F.col("id") == 2).select(
        auto_fragments(df, style="mysql").alias("j")).collect()[0]["j"]
    assert '"precise_decimal":-987654321.9876543210' in raw


def test_mysql_time_duration_vector(spark):
    """TIME(6) vector '1d 10:30:45.123456' (converter.rs:344-352):
    encoded from a signed seconds+micros duration."""
    from database_replicator_spark.functions import doc_json as J

    df = spark.createDataFrame([(124245, 123456), (-3600, 0)], "secs long, us long")
    rows = df.select(
        J.json_mysql_time(F.col("secs"), F.col("us")).alias("t")
    ).collect()
    assert json.loads(rows[0]["t"]) == {"_type": "time", "value": "1d 10:30:45.123456"}
    assert json.loads(rows[1]["t"])["value"].startswith("-0d 01:00:00")
