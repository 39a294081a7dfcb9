"""Streaming exact dedup with BOUNDED state — the state-store tier.

Two complementary streaming-dedup designs exist in this engine:

* **Index tier** (``corpus_ingest``): every accepted fingerprint is
  appended to a persistent parquet index and each batch anti-joins it —
  catches duplicates across ALL time, state grows with the corpus, and
  the cost per epoch is an index-keyed shuffle.
* **State-store tier** (this module): Spark's native
  ``dropDuplicatesWithinWatermark`` keeps seen keys in the checkpointed
  state store and EVICTS them once the event-time watermark passes —
  state is bounded by the unique-key arrival rate × the watermark
  horizon, not corpus size, and dedup happens inline in the stream with
  no external table. The trade is the horizon itself: a duplicate
  arriving later than ``delay`` after the first copy is NOT caught.

The right composition at 100 TB is both: the state-store tier absorbs
the torrent of near-in-time replays (at-least-once sources, retried
producers — the overwhelming duplicate mass in practice) cheaply and
inline, and the index tier behind it handles the long tail of all-time
duplicates at O(delta) per epoch.

Exactly-once notes: the state store lives in the checkpoint, so a
restarted query resumes with its seen-set intact (tested); the parquet
sink's output commit log makes replayed epochs idempotent. This is the
same recovery contract as the reference's queue-ack CDC consumer
(sqlite-watcher/src/queue.rs ack = offset commit), expressed as Spark
checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: fingerprinted-document feed: what an upstream fingerprint stage emits.
FEED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprint", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("fingerprint",),
    time_col: str = "event_time",
    delay: str = "1 hour",
) -> DataFrame:
    """First-wins exact dedup on ``key_cols`` with state bounded by the
    ``delay`` event-time horizon. Pure declaration: the state-store
    layout, eviction, and recovery all come from the engine."""
    return stream.withWatermark(time_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def start_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    delay: str = "1 hour",
):
    """Drive a JSON document feed through the state-store dedup into an
    append-only parquet corpus. ``availableNow`` trigger: drains what is
    available then stops, so callers sequence micro-batches by dropping
    files and re-starting against the SAME checkpoint (the seen-key
    state survives restarts — that is the point)."""
    stream = (
        spark.readStream.schema(FEED_SCHEMA)
        .option("multiLine", "true")
        .json(source_dir)
    )
    deduped = dedup_within_watermark(stream, delay=delay)
    return (
        deduped.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
