"""SparkSession factory with scale-appropriate defaults.

Local test profile: ``local[N]`` single-JVM. Cluster profile: the same
settings minus master/memory are what we would submit to a real cluster;
AQE handles runtime re-planning (skew joins, partition coalescing) at
100 TB scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "database_replicator_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Defaults are chosen for the test harness (local mode, 32 threads) but the
    AQE / Arrow / broadcast settings are exactly what a cluster deployment
    would use: AQE coalesces the statically-overprovisioned shuffle partition
    count at runtime, so ``shuffle_partitions`` is an upper bound, not a tuning
    knob that must be re-derived per query.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE can only coalesce DOWN from the initial partition count, so
        # the ceiling must be sized for the LARGEST shuffle, not the
        # typical one: with the ceiling at 32, a 16x-scale shuffle is
        # forced through ~400 MB partitions and spills (measured 12 GiB
        # on the r13 containment probe — 0 with 512); AQE's 64 MB
        # advisory target still coalesces small shuffles to few
        # partitions, so the floor cost is unchanged. On a real cluster
        # this ceiling scales with executor count.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            "512",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Prefer shuffle-hash over sort-merge when a build side fits the
        # per-partition hash map: the engine's heavy joins stream THIN
        # keyed rows against doc-grain relations carrying fat array
        # payloads (shingle sets, signatures), and SMJ's sort of the fat
        # side is what spills at scale (12 GiB on the 16x containment
        # probe leg; 0 with SHJ). Broadcast still wins under the 64 MB
        # threshold; AQE skew-join still splits skewed SHJ partitions.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # The fixture `events` table stores TIMESTAMP(NANOS) which Spark's
        # vectorized parquet reader rejects; read nanos as long and convert
        # in the catalog loader (sources/catalog.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
