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


def cleanup_stale_stages(root: str, max_age_hours: float = 24.0) -> list[str]:
    """Startup GC for orphaned ``.stage`` directories (§2.11: the
    reference cleans managed temp dirs older than 24 h at startup,
    utils.rs:961-1023 / main.rs:254-259).

    A fresh ``.stage`` may belong to a crash where the stage is the only
    complete copy (see staged_overwrite) — hence the age guard: only
    stages older than ``max_age_hours`` are reclaimed, giving operators a
    recovery window. Returns the removed paths."""
    import time

    removed: list[str] = []
    if not os.path.isdir(root):
        return removed
    cutoff = time.time() - max_age_hours * 3600
    for dirpath, dirnames, _files in os.walk(root):
        for d in list(dirnames):
            if d.endswith(".stage"):
                full = os.path.join(dirpath, d)
                try:
                    if os.path.getmtime(full) < cutoff:
                        shutil.rmtree(full, ignore_errors=True)
                        removed.append(full)
                finally:
                    dirnames.remove(d)  # never descend into stages
    return removed


def parquet_exists(path: str) -> bool:
    """True when ``path`` holds a readable parquet dataset (the _SUCCESS /
    part-file layout Spark writes)."""
    if not os.path.isdir(path):
        return False
    return any(name.endswith(".parquet") for name in os.listdir(path))
