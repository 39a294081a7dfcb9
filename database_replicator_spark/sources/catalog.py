"""Table catalog over a directory of parquet files (the test fixture layout)
plus JDBC-source plumbing for real databases.

Reference parity: discovery in the reference walks live catalogs
(src/migration/schema.rs:33-86 for Postgres, sqlite_master, MySQL
INFORMATION_SCHEMA, Mongo list_collection_names — SURVEY.md §1.3). Here the
same role is played by a directory of parquet tables for tests and by
``jdbc.discover_tables`` for live sources.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The fixture tables the driver generates (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_configured(spark: SparkSession) -> None:
    """Set the runtime SQL confs the engine's semantics depend on, so queries
    behave identically on a session we did not build (e.g. the driver's):
    nanos-as-long lets Spark read TIMESTAMP(NANOS) parquet, a UTC session
    timezone pins timestamp rendering/casts, and pinning timestampType to
    the default LTZ keeps ``cast("timestamp")`` meaning TimestampType even
    on a caller session that overrode it (a TIMESTAMP_NTZ default would
    turn the NTZ→LTZ restore in load_table into a no-op)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Parquet scans get predicate pushdown +
    column pruning from Catalyst automatically.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark reads as a long
    (spark.sql.legacy.parquet.nanosAsLong) — convert to a microsecond
    timestamp here so downstream operators see a proper TimestampType.
    ``div`` keeps the arithmetic in longs (a double would lose precision on
    nanosecond epochs ≈ 1.7e18 > 2^53).
    """
    from pyspark.sql import functions as F

    ensure_configured(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) fixtures read as long under nanosAsLong.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # timestamp[us] (no tz) fixtures read as TIMESTAMP_NTZ, which
            # rejects numeric casts (gap arithmetic, epoch bucketing).
            # Session tz is pinned UTC, so NTZ→LTZ is value-identical and
            # restores TimestampType for every downstream operator. Cast
            # to the explicit type, not "timestamp", which resolves
            # through spark.sql.timestampType at execution time.
            from pyspark.sql.types import TimestampType

            df = df.withColumn("ts", F.col("ts").cast(TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so operators can be
    written in pure SQL when that is clearer."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
