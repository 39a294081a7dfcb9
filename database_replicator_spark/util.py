"""Small shared utilities."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def staged_overwrite(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Overwrite ``path`` with ``df`` even when ``df`` reads from ``path``
    (parquet's read-modify-overwrite hazard): write to a ``.stage`` sibling,
    rewrite the target from the staged copy, then remove the stage.

    A lakehouse format (Delta/Iceberg) replaces this dance with a real
    transactional MERGE; plain parquet pays a double write.

    Crash posture: the stage directory is removed only AFTER the target
    rewrite succeeds — if the final overwrite dies midway, the stage is
    the only complete copy and is deliberately left on disk for manual
    (or next-run) recovery."""
    stage = path + ".stage"
    df.write.mode("overwrite").parquet(stage)
    spark.read.parquet(stage).write.mode("overwrite").parquet(path)
    shutil.rmtree(stage, ignore_errors=True)


def parquet_exists(path: str) -> bool:
    """True when ``path`` holds a readable parquet dataset (the _SUCCESS /
    part-file layout Spark writes)."""
    if not os.path.isdir(path):
        return False
    return any(name.endswith(".parquet") for name in os.listdir(path))
