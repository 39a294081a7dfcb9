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
    # Scale-dependent knobs, env-parameterised (optimization-guide §2:
    # partitioning must be scale-adaptive, not a constant tuned for one
    # scale). Defaults are the LOCAL-bench values; the 16x scale probes
    # (tools/scale_probe.py) raise the AQE ceiling.
    #
    # - AQE initial partition ceiling: AQE only coalesces DOWN, so the
    #   ceiling must cover the largest shuffle — at 16x probe scale a
    #   ceiling of 32 forces ~400 MB partitions and spills (measured
    #   12 GiB on the r13 containment probe leg; 0 at 512). But at bench
    #   scale a 512 ceiling multiplies every tiny shuffle's pre-coalesce
    #   task count and the per-epoch streaming applies drown in
    #   scheduler overhead (cdc_replay_latest 8.3 s -> 45-98 s warm,
    #   measured r13). Default: unset = Spark derives it from
    #   spark.sql.shuffle.partitions (= core count locally); production
    #   sizes it to executor count x a largest-shuffle factor.
    # - preferSortMergeJoin=false (shuffle-hash when the per-partition
    #   build side fits): SHJ avoids SMJ's fat-row sort at the 16x probe
    #   leg (the 12 GiB spill above), and the r13 bench-scale A/B was
    #   wash-to-better for SHJ (doc_bm25_prf_topk 5.5 s vs 8.5 s,
    #   corpus_build_e2e 9.9 vs 11.9, replay/containment within noise)
    #   — so SHJ preference is the default at every scale, overridable.
    aqe_initial = os.environ.get("SPARK_GRAFT_AQE_INITIAL")
    prefer_shj = os.environ.get("SPARK_GRAFT_PREFER_SHJ", "1") == "1"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.join.preferSortMergeJoin",
            "false" if prefer_shj else "true",
        )
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
    if aqe_initial:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            aqe_initial,
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
