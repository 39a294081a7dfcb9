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


def spread_by(df: DataFrame, col) -> DataFrame:
    """Repartition on a key with an EXPLICIT partition count
    (``sparkContext.defaultParallelism``). A bare ``repartition(col)``
    is subject to AQE coalescing, which folds a small-but-CPU-heavy
    shuffle (e.g. 5k docs ≈ 1.5 MB about to explode into 1.5M char-gram
    rows) back into ONE partition — measured 9× slower on the winnowing
    scan at sf0.1. The explicit count pins the fan-out; AQE still
    coalesces every DOWNSTREAM shuffle where sizing is the right
    heuristic."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, col)


def bucketed_exists(path: str) -> bool:
    """True when ``path`` holds a Hive-partitioned parquet dataset with
    ``bucket=<n>`` partition directories (the bucketed ``_latest``
    layout)."""
    if not os.path.isdir(path):
        return False
    return any(name.startswith("bucket=") for name in os.listdir(path))


def staged_bucket_overwrite(
    spark: SparkSession, df: DataFrame, path: str, touched: list[int] | None
) -> None:
    """Overwrite only the ``bucket=<n>`` partitions of ``path`` named in
    ``touched`` with ``df`` (which must carry a ``bucket`` column), even
    when ``df`` reads from ``path``: the staged write materializes the
    merged buckets first, then swaps each touched partition directory in.
    Untouched bucket directories are never opened or rewritten — their
    files stay byte-identical, which keeps per-epoch write volume
    O(touched buckets), not O(table).

    ``touched=None`` means "replace everything" (the one-time migration
    from a flat layout): every bucket of ``df`` is written and any
    top-level flat parquet files are removed.

    Crash posture mirrors :func:`staged_overwrite`: the stage directory is
    removed only after the swaps complete."""
    stage = path + ".stage"
    df.write.mode("overwrite").partitionBy("bucket").parquet(stage)
    os.makedirs(path, exist_ok=True)
    if touched is None:
        touched = [
            int(name.split("=", 1)[1])
            for name in os.listdir(stage)
            if name.startswith("bucket=")
        ]
        for name in list(os.listdir(path)):
            if name.endswith(".parquet") or name == "_SUCCESS":
                os.remove(os.path.join(path, name))
    for b in touched:
        dst = os.path.join(path, f"bucket={b}")
        src = os.path.join(stage, f"bucket={b}")
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        if os.path.isdir(src):
            shutil.move(src, dst)
    shutil.rmtree(stage, ignore_errors=True)


def parquet_exists(path: str) -> bool:
    """True when ``path`` holds a readable parquet dataset (the _SUCCESS /
    part-file layout Spark writes)."""
    if not os.path.isdir(path):
        return False
    return any(name.endswith(".parquet") for name in os.listdir(path))
